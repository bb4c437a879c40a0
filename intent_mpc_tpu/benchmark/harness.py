"""Benchmark harness: multi-trial driver + aggregation.

Replaces scripts/run_mpc_benchmark.py (ROS-process lifecycle + monitor
node) with a batched device run: every seeded trial is a scenario in one
vmapped/sharded batch, so "run 50 trials" is one device program instead of
50 roslaunch cycles. Per-trial metrics mirror BenchmarkMetrics
(run_mpc_benchmark.py:52-149); aggregation mirrors
analyze_mpc_benchmark.py:88-180.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import os
import time
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from intent_mpc_tpu.models.world import straight_line_ref_traj
from intent_mpc_tpu.parallel import sharding as sh
from intent_mpc_tpu.utils.config import IntentMPCConfig


# Measured safe envelope for ONE engine-scan dispatch on this machine's
# TPU tunnel (benchmark/crash_probe.py bisect, RESULTS.md round 3): the
# tunnel worker crashes ("TPU worker process crashed or restarted ...
# kernel fault") when a single dispatch runs too many engine-body
# iterations — 128-batch tiling: OK at 700 cycles, crash at 850 (x2);
# 64-batch tiling: OK at 1000 (~230 s!), crash at 1300; a PLAIN matmul
# scan runs 87 s / 450k iterations fine. Neither wall-clock duration nor
# batch x cycles explains the data; the envelope is per compiled
# program, consistent with a per-body-iteration resource leak in the
# worker whose rate depends on the program's tiling. 512 cycles is
# conservative for every tiling measured.
#
# Round-4 per-shape certification at THIS envelope (crash_probe, each a
# single 512-cycle dispatch, VERDICT r3 item 6b): batch 32 OK, batch 80
# OK, batch 128 OK (round 3: OK at 700), plant="quadrotor" @32 OK,
# goal_mode @32 OK. One caveat measured the hard way: a HEAVIER
# per-cycle program can crash the worker well below 512 — the
# truncation="osqp" engine program (up to 10x the per-cycle iteration
# count) killed the worker on its FIRST 512-cycle dispatch and runs
# cleanly at --chunk-cycles 50 — run_trials therefore auto-selects the
# envelope by PROGRAM CLASS (default_chunk_cycles below) instead of
# relying on the caller to remember; an explicit chunk_cycles still
# overrides for probing.
SAFE_SINGLE_DISPATCH_CYCLES = 512
# Per-program-class envelope for the heavier truncation="osqp" engine
# body (a while_loop of termination-check blocks per candidate solve,
# up to 10x the fixed path's per-cycle iteration count). 50 is the
# measured-clean chunk from the round-4 crash; certified by
# benchmark/crash_probe.py --truncation osqp.
SAFE_OSQP_TRUNCATION_CYCLES = 50


def default_chunk_cycles(cfg: IntentMPCConfig, batch: Optional[int] = None
                         ) -> int:
    """Measured-safe single-dispatch cycle envelope for cfg's engine
    program class (see the crash-envelope notes above). The envelope is
    tiling-dependent: batch tilings ABOVE the certified 128 crashed the
    worker at 512 cycles in round 5 (a 256-lane fleet died on its first
    512-cycle dispatch; the round-3 256-trial sweep ran cleanly chunked
    at 100), so larger fleets fall back to the 100-cycle chunk."""
    if cfg.planner.solver.truncation != "fixed":
        return SAFE_OSQP_TRUNCATION_CYCLES
    if batch is not None and batch > 128:
        return 100
    return SAFE_SINGLE_DISPATCH_CYCLES

# Certified-good XLA batch tilings on the tunnel chip (RESULTS.md batch
# curve): 36/48/64/96/112 fall 2-3x below these neighbors. Requested
# batches between the good points are padded UP and the padding rows
# dropped — a padded run at the next good tiling beats the raw cliff
# tiling by 2-3x even after paying for the extra scenarios.
GOOD_BATCH_SIZES = (32, 40, 56, 80, 128)


def padded_batch_size(n: int) -> int:
    """Round a requested batch up to the next certified-good tiling.

    <=32 and exact good sizes pass through; 32<n<128 rounds to the next
    good point; >128 rounds to a multiple of 128 (the measured peak
    tiling)."""
    if n <= GOOD_BATCH_SIZES[0] or n in GOOD_BATCH_SIZES:
        return n
    if n < GOOD_BATCH_SIZES[-1]:
        return min(g for g in GOOD_BATCH_SIZES if g >= n)
    return -(-n // 128) * 128


def run_trials(cfg: IntentMPCConfig, seeds: Sequence[int],
               mesh=None, solver_iters: Optional[int] = None,
               num_cycles: Optional[int] = None,
               pad_batch: Optional[bool] = None,
               chunk_cycles: Optional[int] = None) -> List[dict]:
    """Run one trial per seed (batched on device); returns per-trial rows.

    On a real TPU, episode scans longer than SAFE_SINGLE_DISPATCH_CYCLES
    are automatically split into multiple dispatches (in-memory carry, no
    checkpoint file) — sharded (mesh) fleets included: the crash envelope
    is per dispatched program on every tiling measured. Requested batch
    sizes that sit on a measured XLA tiling cliff are padded up to the
    next GOOD_BATCH_SIZES entry with extra seeds and the padding rows
    dropped (pad_batch=None: auto on TPU without a mesh; mesh batches
    must stay divisible by the device count so the caller controls them).
    chunk_cycles overrides the dispatch-split threshold (tests)."""
    seeds = list(seeds)
    n_req = len(seeds)
    if pad_batch is None:
        pad_batch = mesh is None and jax.devices()[0].platform == "tpu"
    if pad_batch:
        n_pad = padded_batch_size(n_req)
        if n_pad != n_req:
            base = max(seeds) + 1
            seeds = seeds + [base + i for i in range(n_pad - n_req)]
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    traj_len = jnp.asarray(ref.shape[0])
    scenarios = sh.stack_scenarios(cfg, seeds)
    total = num_cycles if num_cycles is not None else cfg.engine.num_cycles
    if chunk_cycles is None and jax.devices()[0].platform == "tpu":
        chunk_cycles = default_chunk_cycles(cfg, batch=len(seeds))
    if chunk_cycles is not None and total > chunk_cycles:
        from intent_mpc_tpu.engine import closed_loop as cl
        from intent_mpc_tpu.models.occupancy import empty_grid
        occ = empty_grid()
        chunk = chunk_cycles

        def local_chunk(carry, scen, start_idx, n):
            def step(c, i):
                c2, _ = jax.vmap(lambda cc, s: cl.episode_step(
                    cfg, s, ref, traj_len, occ, cc, i,
                    solver_iters=solver_iters))(c, scen)
                return c2, None
            c, _ = jax.lax.scan(step, carry, start_idx + jnp.arange(n))
            return c

        if mesh is not None:
            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P
            scenarios = sh.shard_scenarios(scenarios, mesh)
            carry = jax.jit(
                jax.vmap(lambda s: cl.init_carry(cfg, s)),
                out_shardings=NamedSharding(mesh, P("batch")))(scenarios)

            def make_chunk(n):
                @partial(shard_map, mesh=mesh,
                         in_specs=(P("batch"), P("batch"), P()),
                         out_specs=P("batch"), check_vma=False)
                def chunk_shard(c, scen, start_idx):
                    return local_chunk(c, scen, start_idx, n)
                return jax.jit(chunk_shard)

            compiled = {}
            start = 0
            while start < total:
                n = min(chunk, total - start)
                if n not in compiled:
                    compiled[n] = make_chunk(n)
                carry = compiled[n](carry, scenarios,
                                    jnp.asarray(start, jnp.int32))
                jax.block_until_ready(carry)
                start += n
        else:
            @partial(jax.jit, static_argnames=("n",))
            def run_chunk(carry, start_idx, n):
                return local_chunk(carry, scenarios, start_idx, n)

            carry = jax.vmap(lambda s: cl.init_carry(cfg, s))(scenarios)
            start = 0
            while start < total:
                n = min(chunk, total - start)
                carry = run_chunk(carry, jnp.asarray(start, jnp.int32), n)
                jax.block_until_ready(carry)
                start += n
        return _rows_from_metrics(cfg, seeds, carry.metrics)[:n_req]
    metrics, _ = sh.batch_rollout(cfg, scenarios, ref, traj_len, mesh=mesh,
                                  solver_iters=solver_iters,
                                  num_cycles=num_cycles)
    return _rows_from_metrics(cfg, seeds, metrics)[:n_req]


def run_trials_checkpointed(cfg: IntentMPCConfig, seeds: Sequence[int],
                            checkpoint_path: str, chunk_cycles: int = 50,
                            solver_iters: Optional[int] = None) -> List[dict]:
    """run_trials with periodic fleet checkpointing (engine/checkpoint.py):
    the whole batched carry snapshots every `chunk_cycles` MPC cycles, and
    a pre-existing checkpoint at `checkpoint_path` resumes bit-exactly
    (the engine is a deterministic scan). Survives preemption mid-run."""
    from intent_mpc_tpu.engine import checkpoint as ckpt
    from intent_mpc_tpu.engine import closed_loop as cl
    from intent_mpc_tpu.models.occupancy import empty_grid

    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    traj_len = jnp.asarray(ref.shape[0])
    cycle_dt = cfg.engine.control_dt * cfg.engine.ticks_per_cycle
    total = int(round(cfg.engine.timeout / cycle_dt))
    occ = empty_grid()

    # np.savez appends .npz; normalize so the resume check sees the same
    # file the save wrote
    if not checkpoint_path.endswith(".npz"):
        checkpoint_path = checkpoint_path + ".npz"
    if os.path.exists(checkpoint_path):
        carry, start, seeds_saved, scenarios = ckpt.load_checkpoint(
            checkpoint_path, cfg)
        if list(seeds_saved) != list(seeds):
            raise ValueError("checkpoint seeds differ from requested seeds")
    else:
        scenarios = sh.stack_scenarios(cfg, seeds)
        carry = jax.vmap(lambda s: cl.init_carry(cfg, s))(scenarios)
        start = 0

    @jax.jit
    def run_chunk(carry, start_idx, n_arr):
        def step(c, i):
            active = i < start_idx + n_arr
            c2, _ = jax.vmap(lambda cc, s: cl.episode_step(
                cfg, s, ref, traj_len, occ, cc, i,
                solver_iters=solver_iters))(c, scenarios)
            return jax.tree.map(
                lambda new, old: jnp.where(active, new, old), c2, c), None
        c, _ = jax.lax.scan(step, carry,
                            start_idx + jnp.arange(chunk_cycles))
        return c

    while start < total:
        n = min(chunk_cycles, total - start)
        carry = run_chunk(carry, jnp.asarray(start, jnp.int32),
                          jnp.asarray(n, jnp.int32))
        jax.block_until_ready(carry)
        start += n
        ckpt.save_checkpoint(checkpoint_path, carry, start, seeds)
    return _rows_from_metrics(cfg, seeds, carry.metrics)


def _rows_from_metrics(cfg: IntentMPCConfig, seeds: Sequence[int],
                       metrics) -> List[dict]:
    rows = []
    m = jax.tree.map(np.asarray, metrics)
    straight = float(np.linalg.norm(np.asarray(cfg.goal) - np.asarray(cfg.start)))
    dt = cfg.engine.control_dt
    for i, seed in enumerate(seeds):
        pl = float(m.path_length[i])
        nj = max(int(m.jerk_samples[i]), 1)
        rows.append({
            "trial_id": i,
            "seed": int(seed),
            "num_obstacles": cfg.world.num_obstacles,
            "dynamic_ratio": cfg.world.dynamic_ratio,
            "goal_reached": bool(m.goal_reached[i]),
            "timeout_reached": not bool(m.goal_reached[i]),
            "collision": bool(m.collision[i]),
            "collision_count": int(m.collision_count[i]),
            "flight_travel_time": float(m.travel_time[i]),
            "path_length": pl,
            "straight_line_distance": straight,
            "path_efficiency": pl / straight if straight > 0 else 0.0,
            "min_distance_to_obstacles": float(m.min_obstacle_dist[i]),
            "vel_violation_count": int(m.vel_violations[i]),
            "acc_violation_count": int(m.acc_violations[i]),
            "jerk_violation_count": int(m.jerk_violations[i]),
            "vel_total_samples": int(m.samples[i]),
            "acc_total_samples": int(m.samples[i]),
            "jerk_total_samples": int(m.jerk_samples[i]),
            "max_velocity": float(m.max_velocity[i]),
            "max_acceleration": float(m.max_acceleration[i]),
            "avg_velocity": float(m.sum_velocity[i]) / max(int(m.n_vel_valid[i]), 1),
            "jerk_rms": float(np.sqrt(m.jerk_sq_sum[i] / nj)),
            "jerk_integral": float(m.jerk_abs_sum[i]) * dt,
            "mpc_solve_count": int(m.solve_attempts[i]),
            "mpc_solve_successes": int(m.solve_successes[i]),
            "mpc_prim_res_avg": float(m.prim_res_sum[i])
            / max(int(m.solve_attempts[i]), 1),
            "mpc_prim_res_max": float(m.prim_res_max[i]),
        })
    return rows


def aggregate(rows: List[dict]) -> dict:
    """Success/collision/violation aggregates (analyze_mpc_benchmark.py:88-180)."""
    n = len(rows)
    if n == 0:
        return {}
    succ = [r for r in rows if r["goal_reached"]]

    def mean(key, subset=None):
        src = subset if subset is not None else rows
        vals = [r[key] for r in src]
        return float(np.mean(vals)) if vals else 0.0

    def rate(cnt_key, tot_key):
        c = sum(r[cnt_key] for r in rows)
        t = sum(r[tot_key] for r in rows)
        return c / t if t else 0.0

    return {
        "num_trials": n,
        "success_rate": len(succ) / n,
        "collision_rate": sum(r["collision"] for r in rows) / n,
        "timeout_rate": sum(r["timeout_reached"] for r in rows) / n,
        "avg_travel_time": mean("flight_travel_time", succ),
        "avg_path_length": mean("path_length", succ),
        "avg_path_efficiency": mean("path_efficiency", succ),
        "avg_min_obstacle_distance": mean("min_distance_to_obstacles"),
        "vel_violation_rate": rate("vel_violation_count", "vel_total_samples"),
        "acc_violation_rate": rate("acc_violation_count", "acc_total_samples"),
        "jerk_violation_rate": rate("jerk_violation_count", "jerk_total_samples"),
        "avg_jerk_rms": mean("jerk_rms"),
        "avg_max_velocity": mean("max_velocity"),
        "solver_success_rate": (
            sum(r["mpc_solve_successes"] for r in rows)
            / max(sum(r["mpc_solve_count"] for r in rows), 1)),
    }


def save_csv(rows: List[dict], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)


def save_json(obj, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)


def main():  # pragma: no cover
    import argparse
    ap = argparse.ArgumentParser(description="Intent-MPC TPU benchmark")
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--seeds", type=int, nargs="+", default=None,
                    help="explicit seed list (overrides --trials/--seed0) "
                         "— e.g. the 13 adjudicated timeout seeds")
    ap.add_argument("--seed0", type=int, default=0)
    ap.add_argument("--obstacles", type=int, default=200)
    ap.add_argument("--dynamic-ratio", type=float, default=0.65)
    ap.add_argument("--timeout", type=float, default=100.0)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--max-obstacles", type=int, default=None,
                    help="QP obstacle-slot count (default: config, 64)")
    ap.add_argument("--out", type=str, default="benchmark_results")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--fused", action="store_true",
                    help="solve with the VMEM-resident fleet kernel")
    ap.add_argument("--dynamic-safety", type=float, default=None,
                    help="dynamic obstacle safety distance (m), "
                         "planner_param.yaml dynamic_safety_dist")
    ap.add_argument("--goal-relax", action="store_true",
                    help="opt-in goal-approach dynamic-safety relaxation "
                         "(EngineConfig.goal_relax, beyond-reference): "
                         "anneal the QP dynamic safety distance after a "
                         "sustained near-goal stall — targets the "
                         "goal-occlusion standoff timeout mode")
    ap.add_argument("--predictor-stale", action="store_true",
                    help="predictor consumes the previous cycle's last "
                         "30 Hz history tick instead of the fresh push "
                         "(EngineConfig.predictor_stale_hist; the "
                         "cadence-deviation measurement)")
    ap.add_argument("--plant", type=str, default=None,
                    choices=["double_integrator", "quadrotor"],
                    help="closed-loop plant (EngineConfig.plant)")
    ap.add_argument("--refine", type=int, default=None,
                    help="shared-factor refinement steps per x-update")
    ap.add_argument("--refine-x0", type=str, default=None,
                    choices=["minv", "prev"])
    ap.add_argument("--factor-reuse", type=int, default=None)
    ap.add_argument("--drift-refresh", type=float, default=None,
                    help="drift-aware early factor refresh threshold "
                         "(SolverConfig.factor_drift_refresh)")
    ap.add_argument("--flat-iter", action="store_true")
    ap.add_argument("--refine-mode", type=str, default=None,
                    choices=["stationary", "cg"])
    ap.add_argument("--per-candidate-factor", action="store_true",
                    help="disable the shared-factor solve (factor every "
                         "intent candidate separately)")
    ap.add_argument("--truncation", type=str, default=None,
                    choices=["fixed", "osqp"],
                    help="SolverConfig.truncation: 'osqp' emulates the "
                         "reference's runtime termination (check every 25 "
                         "iters, eps 1e-3, --iters as the time-limit cap)")
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="fleet checkpoint .npz: snapshot every "
                         "--chunk-cycles MPC cycles; an existing file "
                         "resumes bit-exactly after preemption")
    ap.add_argument("--chunk-cycles", type=int, default=None,
                    help="single-dispatch cycle envelope override "
                         "(default: program-class auto via "
                         "default_chunk_cycles; checkpoint mode "
                         "defaults to 50)")
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from intent_mpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = IntentMPCConfig()
    cfg = cfg.replace(
        world=dataclasses.replace(cfg.world, num_obstacles=args.obstacles,
                                  dynamic_ratio=args.dynamic_ratio),
        engine=dataclasses.replace(
            cfg.engine, timeout=args.timeout,
            predictor_stale_hist=args.predictor_stale,
            goal_relax=args.goal_relax,
            plant=(args.plant if args.plant else cfg.engine.plant)))
    if args.max_obstacles is not None:
        cfg = cfg.replace(planner=dataclasses.replace(
            cfg.planner, max_obstacles=args.max_obstacles))
    if args.dynamic_safety is not None:
        cfg = cfg.replace(planner=dataclasses.replace(
            cfg.planner, dynamic_safety_dist=args.dynamic_safety))
    if args.per_candidate_factor:
        cfg = cfg.replace(planner=dataclasses.replace(
            cfg.planner, solver=dataclasses.replace(
                cfg.planner.solver, shared_factor=False)))
    if args.truncation:
        cfg = cfg.replace(planner=dataclasses.replace(
            cfg.planner, solver=dataclasses.replace(
                cfg.planner.solver, truncation=args.truncation)))
    if args.fused:
        cfg = cfg.replace(planner=dataclasses.replace(
            cfg.planner, solver=dataclasses.replace(
                cfg.planner.solver, fused_solve=True)))
    if (args.refine is not None or args.refine_mode is not None
            or args.refine_x0 is not None or args.factor_reuse is not None
            or args.flat_iter or args.drift_refresh is not None):
        sv = cfg.planner.solver
        sv = dataclasses.replace(
            sv,
            shared_refine_iters=(args.refine if args.refine is not None
                                 else sv.shared_refine_iters),
            shared_refine_mode=(args.refine_mode if args.refine_mode
                                else sv.shared_refine_mode),
            shared_refine_x0=(args.refine_x0 if args.refine_x0
                              else sv.shared_refine_x0),
            factor_reuse_cycles=(args.factor_reuse
                                 if args.factor_reuse is not None
                                 else sv.factor_reuse_cycles),
            factor_drift_refresh=(args.drift_refresh
                                  if args.drift_refresh is not None
                                  else sv.factor_drift_refresh),
            flat_iter=args.flat_iter or sv.flat_iter)
        cfg = cfg.replace(planner=dataclasses.replace(
            cfg.planner, solver=sv))

    t0 = time.time()
    seeds = (args.seeds if args.seeds is not None
             else range(args.seed0, args.seed0 + args.trials))
    if args.checkpoint:
        rows = run_trials_checkpointed(
            cfg, list(seeds), args.checkpoint,
            chunk_cycles=(args.chunk_cycles if args.chunk_cycles is not None
                          else 50),
            solver_iters=args.iters)
    else:
        # chunk_cycles=None lets run_trials pick the program-class
        # envelope (default_chunk_cycles); an explicit --chunk-cycles
        # overrides for probing
        rows = run_trials(cfg, seeds, solver_iters=args.iters,
                          chunk_cycles=args.chunk_cycles)
    elapsed = time.time() - t0
    agg = aggregate(rows)
    agg["wall_time_s"] = elapsed
    save_csv(rows, os.path.join(args.out, "trials.csv"))
    save_json(agg, os.path.join(args.out, "summary.json"))
    print(json.dumps(agg, indent=2))


if __name__ == "__main__":  # pragma: no cover
    main()

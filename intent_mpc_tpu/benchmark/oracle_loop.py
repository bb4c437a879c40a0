"""Oracle-in-the-loop validation: fly the closed loop on the f64 oracle.

Purpose (RESULTS.md "Known benchmark-regime property"): the DYNUS
benchmark's commanded-limit violation rates are claimed to be a property
of the FORMULATION (chronically infeasible candidate QPs whose compromise
iterates the reference executes without checking OSQP status,
mpcPlanner.cpp:513-526), not an artifact of the f32 TPU solver. This
driver substantiates that claim experimentally: it runs the exact same
closed loop — same world, detector, predictor, candidate construction,
scoring, controller — but solves every candidate QP with the native f64
oracle (native/qp_solver.cpp: Ruiz scaling, in-solve adaptive rho with
refactorization, warm start) through jax.pure_callback, then compares
violation statistics side by side with the f32 runtime on the same seeds.

If the oracle loop shows comparable violation rates, the formulation
claim stands; if it flies clean, the runtime solver is leaving quality on
the table.

Usage:
  python -m intent_mpc_tpu.benchmark.oracle_loop --seeds 0 1 2 3 \
      --obstacles 200 --max-obstacles 32 --timeout 60 \
      --oracle-iters 150 --out results/oracle_loop
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from intent_mpc_tpu.ops import qp as qplib
from intent_mpc_tpu.ops.admm import ADMMResult
from intent_mpc_tpu.utils.config import IntentMPCConfig, PlannerConfig


def make_oracle_override(cfg: PlannerConfig, max_iter: int = 150,
                         eps: float = 1e-3, adapt_interval: int = 50):
    """Build a make_plan_with_pred solve_override that solves the 6
    candidate QPs with the native f64 oracle via jax.pure_callback.

    The callback receives the dense problem data (materialized from the
    structured QPData inside the jitted program) and the reference-style
    primal warm start; it returns primal, duals, and the primal residual
    so the engine's acceptance / scoring path is identical."""
    from intent_mpc_tpu.oracle import native
    if not native.available():
        raise RuntimeError("native f64 oracle unavailable")

    hdiag = np.asarray(qplib.hessian_diag(cfg), np.float64)
    n = cfg.num_vars

    def host_solve(A6, l6, u6, q6, warm6):
        A6 = np.asarray(A6, np.float64)
        l6 = np.asarray(l6, np.float64)
        u6 = np.asarray(u6, np.float64)
        q6 = np.asarray(q6, np.float64)
        warm6 = np.asarray(warm6, np.float64)
        # parallel native executor: all candidate QPs solve across
        # std::thread workers in one call (imt_solve_qp_batch). A zero
        # warm row is identical to a cold start inside the solver, so
        # the per-row warm gate of the sequential path folds away.
        xs64, ys64, _status, _iters = native.solve_qp_batch(
            hdiag, q6, A6, l6, u6, max_iter=max_iter, eps=eps,
            adapt_interval=adapt_interval, x0=warm6)
        ax = np.einsum("cmn,cn->cm", A6, xs64)
        z = np.clip(ax, l6, u6)
        prim = np.abs(ax - z).max(axis=-1).astype(np.float32)
        return (xs64.astype(np.float32), ys64.astype(np.float32), prim)

    def override(qps, warm6):
        A6 = jax.vmap(lambda qq: qplib.dense_a_matrix(cfg, qq))(qps)
        l6 = jax.vmap(lambda qq: qplib.con_to_flat(qq.l))(qps)
        u6 = jax.vmap(lambda qq: qplib.con_to_flat(qq.u))(qps)
        C, m = A6.shape[0], A6.shape[1]
        K = qps.G.shape[2]
        shapes = (jax.ShapeDtypeStruct((C, n), jnp.float32),
                  jax.ShapeDtypeStruct((C, m), jnp.float32),
                  jax.ShapeDtypeStruct((C,), jnp.float32))
        xs, ys, prim = jax.pure_callback(host_solve, shapes, A6, l6, u6,
                                         qps.q, warm6)
        y_con = jax.vmap(lambda v: qplib.flat_to_con(v, cfg, K))(ys)
        return ADMMResult(
            x=xs, y=y_con, prim_res=prim,
            dual_res=jnp.full_like(prim, jnp.nan),
            solved=prim < 5e-2,
            rho_suggest=jnp.full_like(prim, cfg.solver.rho))

    return override


def make_osqp_override(cfg: PlannerConfig, time_limit: float = 0.05,
                       eps_abs: float = 1e-3, eps_rel: float = 1e-3,
                       max_iter: int = 4000):
    """solve_override that flies the closed loop on the reference's ACTUAL
    vendored libosqp.so (oracle/osqp_ref.py) at the reference's exact
    runtime protocol (mpcPlanner.cpp:439-527):

      - OSQP 0.6.2 defaults (eps 1e-3, adaptive rho, check_termination 25,
        polish OFF — constants.h POLISH(0), never overridden)
      - verbose off, warm_start on
      - fresh osqp_setup per candidate solve (the reference constructs a
        new OsqpEigen::Solver inside solveTraj every call)
      - warm primal = previous best solution, warm dual = zeros
        (setWarmStart at mpcPlanner.cpp:489-509; zeros on firstTime)
      - time_limit = solver_time_limit (0.05 s) EXCEPT on the first solve
        (firstTime_ gate at :442-444). A zero warm row marks first-time:
        the engine feeds zeros until a solution exists, and a real
        solution is never exactly all-zero.
      - any non-error exit is accepted and executed (the reference only
        checks the OsqpEigen error flag, :512-520 — time-limit/max-iter
        iterates fly)
    """
    from intent_mpc_tpu.oracle import osqp_ref
    if not osqp_ref.available():
        raise RuntimeError("vendored libosqp.so unavailable")

    hdiag = np.asarray(qplib.hessian_diag(cfg), np.float64)
    P = np.diag(hdiag)
    n = cfg.num_vars

    def host_solve(A6, l6, u6, q6, warm6):
        A6 = np.asarray(A6, np.float64)
        l6 = np.asarray(l6, np.float64)
        u6 = np.asarray(u6, np.float64)
        q6 = np.asarray(q6, np.float64)
        warm6 = np.asarray(warm6, np.float64)
        C = A6.shape[0]
        xs = np.zeros((C, n))
        ys = np.zeros((C, A6.shape[1]))
        for c in range(C):
            first = not np.any(warm6[c])
            r = osqp_ref.solve(
                P, q6[c], A6[c], l6[c], u6[c], eps_abs=eps_abs,
                eps_rel=eps_rel, max_iter=max_iter,
                time_limit=0.0 if first else time_limit,
                warm_x=warm6[c])
            xs[c] = r["x"]
            ys[c] = r["y"]
        ax = np.einsum("cmn,cn->cm", A6, xs)
        z = np.clip(ax, l6, u6)
        prim = np.abs(ax - z).max(axis=-1).astype(np.float32)
        return (xs.astype(np.float32), ys.astype(np.float32), prim)

    def override(qps, warm6):
        A6 = jax.vmap(lambda qq: qplib.dense_a_matrix(cfg, qq))(qps)
        l6 = jax.vmap(lambda qq: qplib.con_to_flat(qq.l))(qps)
        u6 = jax.vmap(lambda qq: qplib.con_to_flat(qq.u))(qps)
        C, m = A6.shape[0], A6.shape[1]
        K = qps.G.shape[2]
        shapes = (jax.ShapeDtypeStruct((C, n), jnp.float32),
                  jax.ShapeDtypeStruct((C, m), jnp.float32),
                  jax.ShapeDtypeStruct((C,), jnp.float32))
        xs, ys, prim = jax.pure_callback(host_solve, shapes, A6, l6, u6,
                                         qps.q, warm6)
        y_con = jax.vmap(lambda v: qplib.flat_to_con(v, cfg, K))(ys)
        return ADMMResult(
            x=xs, y=y_con, prim_res=prim,
            # accept-any-iterate: the reference executes whatever OSQP
            # returns on a non-error exit, including time-limit iterates
            dual_res=jnp.full_like(prim, jnp.nan),
            solved=jnp.ones_like(prim, bool),
            rho_suggest=jnp.full_like(prim, cfg.solver.rho))

    return override


def run_divergence(cfg: IntentMPCConfig, seed: int, override,
                   runtime_iters=None, truncation: str = None) -> dict:
    """Per-cycle control divergence over a LOCKSTEP episode (VERDICT r3
    item 3c): each replan cycle, solve the same carry TWICE — once with
    the real-OSQP override (which flies the episode) and once with the
    f32 runtime solver — and record the inf-norm distance between the two
    CHOSEN control solutions (each side's own candidate scoring, i.e. the
    command stream each solver would execute). Reported per cycle:
      du_full  = ||controls_osqp - controls_f32||_inf over the horizon
      du_first = same over the FIRST control step (the executed 100 ms)
    """
    import dataclasses as dc
    from intent_mpc_tpu.engine import closed_loop as cl
    from intent_mpc_tpu.models.occupancy import empty_grid
    from intent_mpc_tpu.models.world import (generate_scenario,
                                             straight_line_ref_traj)

    if truncation:
        cfg = cfg.replace(planner=dc.replace(cfg.planner, solver=dc.replace(
            cfg.planner.solver, truncation=truncation)))
    sc = generate_scenario(seed=seed, cfg=cfg.world)
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    traj_len = jnp.asarray(ref.shape[0])
    occ = empty_grid()
    H, W = cfg.planner.horizon, cfg.planner.mpc_window

    @jax.jit
    def step_osqp(carry, i):
        return cl.episode_step(cfg, sc, ref, traj_len, occ, carry, i,
                               solve_override=override)[0]

    @jax.jit
    def step_f32(carry, i):
        return cl.episode_step(cfg, sc, ref, traj_len, occ, carry, i,
                               solver_iters=runtime_iters)[0]

    carry = cl.init_carry(cfg, sc)
    c_osqp = carry
    du_full, du_first = [], []
    n = cfg.engine.num_cycles
    for i in range(n):
        ii = jnp.asarray(i, jnp.int32)
        c_osqp = step_osqp(carry, ii)
        c_f32 = step_f32(carry, ii)
        if bool(c_osqp.done) and bool(carry.done):
            break
        if bool(c_osqp.traj_ready) and bool(c_f32.traj_ready):
            uo = np.asarray(c_osqp.planner.controls_sol).reshape(W, 5)[:, :3]
            uf = np.asarray(c_f32.planner.controls_sol).reshape(W, 5)[:, :3]
            du_full.append(float(np.abs(uo - uf).max()))
            du_first.append(float(np.abs(uo[0] - uf[0]).max()))
        carry = c_osqp      # the OSQP solution flies the episode
    row = {"seed": seed, "cycles_compared": len(du_full),
           "goal_reached": bool(c_osqp.metrics.goal_reached)}
    for name, a in (("du_full", np.array(du_full)),
                    ("du_first", np.array(du_first))):
        # no cycle had both trajectories ready (e.g. num_cycles 0 or a
        # first-solve failure on both sides): report null stats instead
        # of NaN means / an empty-percentile crash
        row[f"{name}_mean"] = float(a.mean()) if a.size else None
        row[f"{name}_p95"] = float(np.percentile(a, 95)) if a.size else None
        row[f"{name}_max"] = float(a.max()) if a.size else None
    return row


def build_cfg(args) -> IntentMPCConfig:
    cfg = IntentMPCConfig()
    planner = dataclasses.replace(cfg.planner,
                                  max_obstacles=args.max_obstacles)
    return cfg.replace(
        planner=planner,
        world=dataclasses.replace(cfg.world, num_obstacles=args.obstacles,
                                  dynamic_ratio=args.dynamic_ratio),
        engine=dataclasses.replace(cfg.engine, timeout=args.timeout))


def main():  # pragma: no cover
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, nargs="+",
                    default=list(range(8)))
    ap.add_argument("--obstacles", type=int, default=200)
    ap.add_argument("--dynamic-ratio", type=float, default=0.65)
    ap.add_argument("--max-obstacles", type=int, default=32,
                    help="QP obstacle slots (reduced from the production "
                         "64 to keep the f64 dense solves tractable; the "
                         "f32 comparison rows use the SAME value)")
    ap.add_argument("--timeout", type=float, default=60.0)
    ap.add_argument("--oracle-iters", type=int, default=150)
    ap.add_argument("--eps", type=float, default=1e-3)
    ap.add_argument("--runtime-iters", type=int, default=None,
                    help="f32 runtime ADMM iterations (default: config)")
    ap.add_argument("--skip-runtime", action="store_true")
    ap.add_argument("--solver", choices=["native", "osqp"],
                    default="native",
                    help="'native' = self-built f64 oracle; 'osqp' = the "
                         "reference's vendored libosqp.so at the "
                         "reference's runtime settings (warm start, "
                         "0.05 s time limit, OSQP defaults)")
    ap.add_argument("--time-limit", type=float, default=0.05,
                    help="per-candidate OSQP time limit (planner_param."
                         "yaml solver_time_limit; 0 disables)")
    ap.add_argument("--divergence", action="store_true",
                    help="per-cycle lockstep control-divergence mode "
                         "(run_divergence): fly each seed on the chosen "
                         "solver, solving every cycle's carry with BOTH "
                         "that solver and the f32 runtime; report "
                         "du_full/du_first stats instead of fleet rows")
    ap.add_argument("--runtime-truncation", type=str, default=None,
                    choices=["fixed", "osqp"],
                    help="f32-runtime truncation mode for --divergence")
    ap.add_argument("--out", type=str, default="results/oracle_loop")
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    from intent_mpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from intent_mpc_tpu.benchmark import harness as H
    from intent_mpc_tpu.engine.closed_loop import run_episode, summarize
    from intent_mpc_tpu.models.world import (generate_scenario,
                                             straight_line_ref_traj)

    cfg = build_cfg(args)
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    traj_len = jnp.asarray(ref.shape[0])
    if args.solver == "osqp":
        override = make_osqp_override(cfg.planner,
                                      time_limit=args.time_limit)
    else:
        override = make_oracle_override(cfg.planner,
                                        max_iter=args.oracle_iters,
                                        eps=args.eps)

    os.makedirs(args.out, exist_ok=True)
    if args.divergence:
        rows = []
        for seed in args.seeds:
            t0 = time.time()
            row = run_divergence(cfg, seed, override,
                                 runtime_iters=args.runtime_iters,
                                 truncation=args.runtime_truncation)
            row["wall_s"] = round(time.time() - t0, 1)
            rows.append(row)
            if row["cycles_compared"]:
                print(f"[div seed {seed}] cycles={row['cycles_compared']} "
                      f"du_first mean={row['du_first_mean']:.3f} "
                      f"p95={row['du_first_p95']:.3f} "
                      f"max={row['du_first_max']:.3f} ({row['wall_s']}s)",
                      flush=True)
            else:
                print(f"[div seed {seed}] cycles=0 (no comparable cycles) "
                      f"({row['wall_s']}s)", flush=True)
        path = os.path.join(args.out, "divergence.json")
        with open(path, "w") as f:
            json.dump({"config": vars(args), "rows": rows}, f, indent=1,
                      default=float)
        print("wrote", path)
        return

    oracle_rows = []
    for seed in args.seeds:
        sc = generate_scenario(seed=seed, cfg=cfg.world)
        t0 = time.time()
        carry, _ = run_episode(cfg, sc, ref, traj_len,
                               solve_override=override)
        row = summarize(cfg, carry)
        row["seed"] = seed
        row["wall_s"] = round(time.time() - t0, 1)
        oracle_rows.append(row)
        print(f"[oracle seed {seed}] goal={row['goal_reached']} "
              f"col={row['collision']} maxv={row['max_velocity']:.2f} "
              f"velviol={row['vel_violation_count']}/{row['vel_total_samples']} "
              f"({row['wall_s']}s)", flush=True)

    out = {"config": {"obstacles": args.obstacles,
                      "max_obstacles": args.max_obstacles,
                      "timeout": args.timeout,
                      "oracle_iters": args.oracle_iters,
                      "eps": args.eps, "seeds": args.seeds,
                      "solver": args.solver,
                      "time_limit": args.time_limit},
           "oracle": H.aggregate(oracle_rows),
           "oracle_rows": oracle_rows}

    if not args.skip_runtime:
        t0 = time.time()
        rt_rows = H.run_trials(cfg, args.seeds,
                               solver_iters=args.runtime_iters)
        for seed, row in zip(args.seeds, rt_rows):
            row["seed"] = seed
        out["runtime"] = H.aggregate(rt_rows)
        out["runtime_rows"] = rt_rows
        out["runtime_wall_s"] = round(time.time() - t0, 1)

    path = os.path.join(args.out, "summary.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps({k: out[k] for k in ("oracle", "runtime")
                      if k in out}, indent=1, default=float))
    print("wrote", path)


if __name__ == "__main__":
    main()

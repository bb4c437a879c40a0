#!/usr/bin/env python
"""Benchmark: full-horizon MPC solve throughput per chip.

Runs the DYNUS-matched closed loop (200-obstacle trefoil world, horizon-30
MPC with 6 intent-combination candidate QPs per replan) for a batch of
scenarios on one chip and measures candidate-QP solves per second.

North-star (BASELINE.md): >= 1000 full-horizon MPC solves/s/chip.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128,
                    help="scenarios per chip (6 candidate QPs each/cycle). "
                         "128 is the measured single-chip throughput peak; "
                         "32 is the certified 100 ms real-time batch "
                         "(RESULTS.md deployment contracts). The "
                         "batch-throughput curve has XLA tiling cliffs: "
                         "36/64/96/112 measure far below 40/56/80/128.")
    ap.add_argument("--cycles", type=int, default=10,
                    help="timed MPC cycles")
    ap.add_argument("--obstacles", type=int, default=200)
    ap.add_argument("--iters", type=int, default=None,
                    help="ADMM iterations per solve (default: config)")
    ap.add_argument("--platform", type=str, default=None,
                    help="force jax platform (e.g. cpu)")
    ap.add_argument("--latency", action="store_true",
                    help="also measure per-cycle dispatch latency (p50/p99)")
    ap.add_argument("--roofline", action="store_true",
                    help="report achieved FLOP/s and HBM bytes/s vs chip "
                         "peaks from XLA's compiled-program cost analysis")
    ap.add_argument("--profile", type=str, default=None,
                    help="write a jax profiler trace to this directory")
    ap.add_argument("--fused", action="store_true",
                    help="solve with the VMEM-resident fleet kernel "
                         "(ops/pallas_fused.py)")
    ap.add_argument("--folded-refine", action="store_true",
                    help="pre-folded refinement normal-operator apply")
    ap.add_argument("--refine", type=int, default=None,
                    help="shared-factor refinement steps per x-update")
    ap.add_argument("--refine-mode", type=str, default=None,
                    choices=["stationary", "cg"])
    ap.add_argument("--per-candidate-factor", action="store_true",
                    help="disable the shared-factor solve (factor every "
                         "intent candidate separately, the pre-r1 default)")
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from intent_mpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses
    from intent_mpc_tpu.utils.config import IntentMPCConfig
    from intent_mpc_tpu.models.world import straight_line_ref_traj
    from intent_mpc_tpu.parallel import sharding as sh
    from intent_mpc_tpu.engine import closed_loop as cl
    from intent_mpc_tpu.models.occupancy import empty_grid

    cfg = IntentMPCConfig()
    cfg = cfg.replace(world=dataclasses.replace(
        cfg.world, num_obstacles=args.obstacles))
    if args.per_candidate_factor:
        planner = dataclasses.replace(
            cfg.planner, solver=dataclasses.replace(
                cfg.planner.solver, shared_factor=False))
        cfg = cfg.replace(planner=planner)
    if args.fused:
        planner = dataclasses.replace(
            cfg.planner, solver=dataclasses.replace(
                cfg.planner.solver, fused_solve=True))
        cfg = cfg.replace(planner=planner)
    if (args.refine is not None or args.refine_mode is not None
            or args.folded_refine):
        sv = cfg.planner.solver
        sv = dataclasses.replace(
            sv,
            folded_refine=args.folded_refine or sv.folded_refine,
            shared_refine_iters=(args.refine if args.refine is not None
                                 else sv.shared_refine_iters),
            shared_refine_mode=(args.refine_mode if args.refine_mode
                                else sv.shared_refine_mode))
        cfg = cfg.replace(planner=dataclasses.replace(
            cfg.planner, solver=sv))

    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    traj_len = jnp.asarray(ref.shape[0])
    occ = empty_grid()

    scenarios = sh.stack_scenarios(cfg, range(args.batch))

    @jax.jit
    def run_cycles(carry, start):
        def step(c, i):
            c2, _ = jax.vmap(
                lambda cc, s: cl.episode_step(cfg, s, ref, traj_len, occ, cc,
                                              i, solver_iters=args.iters),
                in_axes=(0, 0))(c, scenarios)
            return c2, None
        carry, _ = jax.lax.scan(step, carry,
                                start + jnp.arange(args.cycles))
        return carry

    carry0 = jax.vmap(lambda s: cl.init_carry(cfg, s))(scenarios)

    # warmup / compile. The second warmup uses a carried-in carry so any
    # weak-type-driven retrace happens before timing.
    t0 = time.time()
    carry = run_cycles(carry0, jnp.asarray(0, jnp.int32))
    jax.block_until_ready(carry)
    compile_time = time.time() - t0
    carry = run_cycles(carry, jnp.asarray(args.cycles, jnp.int32))
    jax.block_until_ready(carry)

    if args.profile:
        with jax.profiler.trace(args.profile):
            t0 = time.time()
            carry = run_cycles(carry, jnp.asarray(2 * args.cycles, jnp.int32))
            jax.block_until_ready(carry)
            elapsed = time.time() - t0
    else:
        t0 = time.time()
        carry = run_cycles(carry, jnp.asarray(2 * args.cycles, jnp.int32))
        jax.block_until_ready(carry)
        elapsed = time.time() - t0

    solves = args.batch * 6 * args.cycles
    sps = solves / elapsed
    cycle_ms = elapsed / args.cycles * 1000.0

    print(json.dumps({
        "metric": "mpc_solves_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "solves/s",
        "vs_baseline": round(sps / 1000.0, 3),
    }))
    print(f"# batch={args.batch} cycles={args.cycles} "
          f"obstacles={args.obstacles} elapsed={elapsed:.3f}s "
          f"cycle={cycle_ms:.1f}ms compile={compile_time:.1f}s "
          f"device={jax.devices()[0].platform}", file=sys.stderr)

    if args.roofline:
        from intent_mpc_tpu.benchmark.roofline import report
        report(cfg, args.batch, args.cycles, elapsed,
               iters=args.iters or cfg.planner.solver.max_iter)

    if args.latency:
        # per-replan-cycle latency (the 100 ms real-time budget;
        # per-candidate-solve budget is 50 ms in the reference)
        @jax.jit
        def single_cycle(c, i):
            c2, _ = jax.vmap(
                lambda cc, s: cl.episode_step(cfg, s, ref, traj_len, occ, cc,
                                              i, solver_iters=args.iters),
                in_axes=(0, 0))(c, scenarios)
            return c2

        c = carry0
        c = single_cycle(c, jnp.asarray(0, jnp.int32))
        jax.block_until_ready(c)
        c = single_cycle(c, jnp.asarray(1, jnp.int32))
        jax.block_until_ready(c)
        lats = []
        for i in range(2, 2 + 50):
            t0 = time.time()
            c = single_cycle(c, jnp.asarray(i, jnp.int32))
            jax.block_until_ready(c)
            lats.append(time.time() - t0)
        import numpy as np
        lats_ms = np.array(lats) * 1000.0
        print(f"# cycle latency ms over {len(lats)} cycles: "
              f"p50={np.percentile(lats_ms, 50):.1f} "
              f"p99={np.percentile(lats_ms, 99):.1f} "
              f"max={lats_ms.max():.1f} (budget 100 ms/replan)",
              file=sys.stderr)


if __name__ == "__main__":
    main()

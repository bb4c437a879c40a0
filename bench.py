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
    ap.add_argument("--no-pad", action="store_true",
                    help="run the requested batch tiling raw instead of "
                         "padding up to the next certified-good size "
                         "(harness.GOOD_BATCH_SIZES) — exposes the XLA "
                         "tiling cliffs for measurement")
    ap.add_argument("--obstacles", type=int, default=200)
    ap.add_argument("--iters", type=int, default=None,
                    help="ADMM iterations per solve (default: config)")
    ap.add_argument("--platform", type=str, default=None,
                    help="force jax platform (e.g. cpu)")
    ap.add_argument("--latency", action="store_true",
                    help="also measure per-cycle dispatch latency (p50/p99) "
                         "in both the blocking and the pipelined depth-1 "
                         "command-stream patterns (see RESULTS.md "
                         "deployment contracts)")
    ap.add_argument("--load", type=int, default=0,
                    help="co-locate N CPU-burn processes during --latency "
                         "(the deployment hazard measured in RESULTS.md)")
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
    ap.add_argument("--refine-x0", type=str, default=None,
                    choices=["minv", "prev"],
                    help="CG x-update initial guess (see SolverConfig)")
    ap.add_argument("--factor-reuse", type=int, default=None,
                    help="refresh the shared factor every k-th cycle "
                         "(SolverConfig.factor_reuse_cycles)")
    ap.add_argument("--drift-refresh", type=float, default=None,
                    help="drift-aware early factor refresh threshold "
                         "(SolverConfig.factor_drift_refresh)")
    ap.add_argument("--flat-iter", action="store_true",
                    help="flat-constraint-space iteration (SolverConfig."
                         "flat_iter)")
    ap.add_argument("--ew-kernel", action="store_true",
                    help="fused elementwise-chain Pallas kernel "
                         "(SolverConfig.ew_kernel, ops/pallas_ew.py)")
    ap.add_argument("--minv-bf16", action="store_true",
                    help="store the shared x-update preconditioner in "
                         "bfloat16 (SolverConfig.minv_dtype)")
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
            or args.folded_refine or args.refine_x0 is not None
            or args.factor_reuse is not None or args.flat_iter
            or args.ew_kernel or args.minv_bf16
            or args.drift_refresh is not None):
        sv = cfg.planner.solver
        sv = dataclasses.replace(
            sv,
            folded_refine=args.folded_refine or sv.folded_refine,
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
            flat_iter=args.flat_iter or sv.flat_iter,
            ew_kernel=args.ew_kernel or sv.ew_kernel,
            minv_dtype="bf16" if args.minv_bf16 else sv.minv_dtype)
        cfg = cfg.replace(planner=dataclasses.replace(
            cfg.planner, solver=sv))

    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    traj_len = jnp.asarray(ref.shape[0])
    occ = empty_grid()

    # cliff batches pad up to the next certified tiling; throughput counts
    # only the REQUESTED scenarios' solves (the padding rows are overhead),
    # which still beats the raw cliff tiling 2-3x (RESULTS.md batch curve)
    from intent_mpc_tpu.benchmark.harness import padded_batch_size
    run_batch = args.batch if args.no_pad else padded_batch_size(args.batch)
    if run_batch != args.batch:
        print(f"# batch {args.batch} sits on a tiling cliff: padded to "
              f"{run_batch} (throughput counts the requested "
              f"{args.batch} only; --no-pad disables)", file=sys.stderr)

    scenarios = sh.stack_scenarios(cfg, range(run_batch))

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
    print(f"# batch={args.batch} (run={run_batch}) cycles={args.cycles} "
          f"obstacles={args.obstacles} elapsed={elapsed:.3f}s "
          f"cycle={cycle_ms:.1f}ms compile={compile_time:.1f}s "
          f"device={jax.devices()[0].platform}", file=sys.stderr)

    if args.roofline:
        from intent_mpc_tpu.benchmark.roofline import report
        report(cfg, args.batch, args.cycles, elapsed,
               iters=args.iters or cfg.planner.solver.max_iter)

    if args.latency:
        # per-replan-cycle latency (the 100 ms real-time budget;
        # per-candidate-solve budget is 50 ms in the reference).
        # Two patterns:
        #  * blocking: enqueue cycle i, fetch its command, repeat — pays
        #    the full host<->TPU tunnel round trip per cycle.
        #  * pipelined depth-1: enqueue cycle i+1, THEN fetch cycle i's
        #    command — the tunnel hides behind compute. This is the
        #    reference's own execution semantics: mpcCB commits a plan
        #    asynchronously while trajExeCB executes the previously
        #    committed one (mpcNavigation.cpp:222-370 vs :499-567), so a
        #    one-cycle-stale commit is exactly how the C++ stack behaves
        #    whenever a solve takes a full replan period.
        import numpy as np
        from functools import partial

        burners = []
        if args.load > 0:
            import multiprocessing as mp

            def _burn():
                x = 1.0
                while True:
                    x = x * 1.0000001 + 1e-9

            burners = [mp.Process(target=_burn, daemon=True)
                       for _ in range(args.load)]
            for p in burners:
                p.start()

        @partial(jax.jit, donate_argnums=(0,))
        def single_cycle(c, i):
            c2, _ = jax.vmap(
                lambda cc, s: cl.episode_step(cfg, s, ref, traj_len, occ, cc,
                                              i, solver_iters=args.iters),
                in_axes=(0, 0))(c, scenarios)
            # the deployment fetch: per-scenario command summary only
            return c2, jnp.concatenate([c2.pos, c2.vel], axis=-1)

        import numpy as np
        tag = f" (load={args.load})" if args.load else ""
        c = jax.vmap(lambda s: cl.init_carry(cfg, s))(scenarios)
        c, cmd = single_cycle(c, jnp.asarray(0, jnp.int32))
        np.asarray(cmd)
        c, cmd = single_cycle(c, jnp.asarray(1, jnp.int32))
        np.asarray(cmd)
        lats = []
        for i in range(2, 2 + 50):
            t0 = time.time()
            c, cmd = single_cycle(c, jnp.asarray(i, jnp.int32))
            np.asarray(cmd)
            lats.append(time.time() - t0)
        a = np.array(lats) * 1e3
        print(f"# cycle latency blocking{tag}: "
              f"p50={np.percentile(a, 50):.1f} "
              f"p99={np.percentile(a, 99):.1f} max={a.max():.1f} ms "
              f"(budget 100 ms/replan)", file=sys.stderr)

        c, cmd_prev = single_cycle(c, jnp.asarray(60, jnp.int32))
        lats = []
        for i in range(61, 61 + 50):
            t0 = time.time()
            c, cmd_i = single_cycle(c, jnp.asarray(i, jnp.int32))
            np.asarray(cmd_prev)
            lats.append(time.time() - t0)
            cmd_prev = cmd_i
        a = np.array(lats) * 1e3
        print(f"# cycle latency pipelined depth-1{tag}: "
              f"p50={np.percentile(a, 50):.1f} "
              f"p99={np.percentile(a, 99):.1f} max={a.max():.1f} ms",
              file=sys.stderr)
        for p in burners:
            p.terminate()


if __name__ == "__main__":
    main()

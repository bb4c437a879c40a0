"""Minimal repro / bisect probe for the single-dispatch fleet-scan crash.

RESULTS.md (round 2): a SINGLE-dispatch 1000-cycle episode scan at batch
128 reproducibly crashed this machine's TPU tunnel worker; batch 64 was
fine; the chunked-checkpoint path (harness --chunk-cycles) is the
workaround. This probe runs ONE jitted dispatch of `cycles` engine MPC
cycles at `batch` scenarios and reports wall time — run it under
`timeout` from a driver that treats a dead/hung probe as a crash data
point.

Key structural fact the bisect exploits: the scan TRIP COUNT does not
change the compiled program (one body, a trip counter), so "program
size" cannot be the crash variable across cycle counts at fixed batch —
only per-dispatch EXECUTION DURATION and output/carry buffer sizes
scale. Bisecting (batch, cycles) pairs of equal duration separates
duration from batch-dependent footprint.

Usage: python -m intent_mpc_tpu.benchmark.crash_probe --batch 128 \
           --cycles 1000 [--plain]
Prints one line: OK batch=.. cycles=.. wall=..s (or dies).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--cycles", type=int, default=1000)
    ap.add_argument("--obstacles", type=int, default=200)
    ap.add_argument("--plain", action="store_true",
                    help="replace the engine body with a plain matmul scan "
                         "of comparable duration (isolates engine-specific "
                         "state from pure long-execution behavior)")
    ap.add_argument("--plant", type=str, default=None,
                    choices=["double_integrator", "quadrotor"],
                    help="production plant variant (EngineConfig.plant)")
    ap.add_argument("--goal-mode", action="store_true",
                    help="goal-mode program shape (EngineConfig.goal_mode, "
                         "linspace reference)")
    ap.add_argument("--truncation", type=str, default=None,
                    choices=["fixed", "osqp"],
                    help="solver truncation class (the osqp emulation is "
                         "the heavier per-cycle program whose envelope "
                         "SAFE_OSQP_TRUNCATION_CYCLES certifies)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from intent_mpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if args.plain:
        # ~83 ms/rep of pure batched matmul at width 1024: pick reps for
        # a comparable duration profile without any engine structure
        M = jax.random.normal(jax.random.PRNGKey(0), (args.batch, 512, 512))

        @jax.jit
        def run(x, n):
            def body(c, _):
                c = jnp.tanh(jnp.matmul(M, c))
                return c / (1e-6 + jnp.max(jnp.abs(c))), None
            c, _ = jax.lax.scan(body, x, None, length=args.cycles)
            return c
        x = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 512, 64))
        run(x, 0)                           # compile
        t0 = time.time()
        out = run(x, 1)
        np.asarray(out)
        print(f"OK plain batch={args.batch} cycles={args.cycles} "
              f"wall={time.time() - t0:.1f}s", flush=True)
        return

    from intent_mpc_tpu.utils.config import IntentMPCConfig
    from intent_mpc_tpu.models.world import straight_line_ref_traj
    from intent_mpc_tpu.models.occupancy import empty_grid
    from intent_mpc_tpu.parallel import sharding as sh
    from intent_mpc_tpu.engine import closed_loop as cl

    cfg = IntentMPCConfig()
    cfg = cfg.replace(world=dataclasses.replace(
        cfg.world, num_obstacles=args.obstacles))
    if args.truncation:
        cfg = cfg.replace(planner=dataclasses.replace(
            cfg.planner, solver=dataclasses.replace(
                cfg.planner.solver, truncation=args.truncation)))
    if args.plant or args.goal_mode:
        cfg = cfg.replace(engine=dataclasses.replace(
            cfg.engine,
            plant=(args.plant if args.plant else cfg.engine.plant),
            goal_mode=args.goal_mode or cfg.engine.goal_mode))
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    traj_len = jnp.asarray(ref.shape[0])
    occ = empty_grid()
    scenarios = sh.stack_scenarios(cfg, range(args.batch))

    @jax.jit
    def run(carry, start):
        def step(c, i):
            c2, _ = jax.vmap(lambda cc, s: cl.episode_step(
                cfg, s, ref, traj_len, occ, cc, i))(c, scenarios)
            return c2, None
        c, _ = jax.lax.scan(step, carry, start + jnp.arange(args.cycles))
        return c

    carry0 = jax.vmap(lambda s: cl.init_carry(cfg, s))(scenarios)
    # compile with a 1-cycle variant first? No — same program; warm the
    # cache with the real thing but measure the second dispatch
    t0 = time.time()
    carry = run(carry0, jnp.asarray(0, jnp.int32))
    np.asarray(carry.pos)
    print(f"OK batch={args.batch} cycles={args.cycles} "
          f"wall={time.time() - t0:.1f}s (incl compile)", flush=True)
    sys.exit(0)


if __name__ == "__main__":
    main()

"""Minimal repro probe for the cumulative XLA:CPU segfault.

Background (tests/conftest.py, tests/run_slow_tier.sh): one pytest
process accumulating every compiled program on this image eventually
segfaults INSIDE XLA:CPU — observed in round 2 at the tier boundary
(cache-load path and backend_compile_and_load) and in round 3 inside the
grown slow tier, at a test that passes alone. The working hypothesis is
per-process resource accumulation in the compiler/loader, not any
specific test. This probe isolates that: compile N DISTINCT programs in
one process until crash (the driver bisects N by watching the last
progress line), with knobs for program size and the on-disk compilation
cache, so the tier-split threshold is principled instead of
re-discovered each round.

Usage (each run is one process; crash -> nonzero exit, last line = count):
  python -m intent_mpc_tpu.benchmark.xla_cpu_probe --n 4000
  python -m intent_mpc_tpu.benchmark.xla_cpu_probe --n 2000 --size 64 --cache
  python -m intent_mpc_tpu.benchmark.xla_cpu_probe --kind engine --n 40

FINDINGS (this image, jax 0.8 XLA:CPU, 2026-08 — results/xla_cpu_probe.json):
  * Program COUNT is NOT the resource: 3000 trivial chains, 1500 deep
    (64-matmul) chains, 1200 scan programs, and 1200 cached programs all
    completed with a flat memory-map profile (~548 maps).
  * The resource is the process's MEMORY-MAP count: every compiled
    executable holds ~3 mappings per fused kernel (LLVM ORC JIT section
    triples r--p 4K / r-xp 4-8K / rw-p 16K), pinned by jax's executable
    caches. An engine-class program (closed-loop scan) compiles to ~620
    kernels => ~1,830 mappings EACH (--kind engine measures this live).
  * Crossing Linux's default vm.max_map_count (65,530) makes the next
    mmap fail and the compiler abort: the instrumented one-process full
    suite died at 65,376 maps with "Fatal Python error: Aborted" inside
    backend_compile_and_load — the same site as the round-2/3 crashes,
    which were never test bugs.
  * Remedies wired into the suite (tests/conftest.py +
    utils/hostlimits.py): raise vm.max_map_count when privileged;
    otherwise a map-budget guard ends the pytest session at
    GUARD_MARGIN headroom with exit 77 and tests/run_suite.sh resumes
    the remaining tests in a fresh process.
"""

from __future__ import annotations

import argparse
import sys


def main():  # pragma: no cover
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=4000,
                    help="distinct programs to compile")
    ap.add_argument("--size", type=int, default=8,
                    help="program operand size (size x size matmul chain)")
    ap.add_argument("--depth", type=int, default=4,
                    help="ops per program (matmul chain length)")
    ap.add_argument("--cache", action="store_true",
                    help="enable the on-disk compilation cache (the suite "
                         "runs with it; default off isolates the compiler)")
    ap.add_argument("--kind", choices=["chain", "scan", "while", "engine"],
                    default="chain",
                    help="program structure: plain matmul chain, lax.scan "
                         "body, lax.while_loop, or real closed-loop ENGINE "
                         "programs (distinct small_config per i — the kind "
                         "that actually exhausts the map budget, ~1.8k "
                         "maps each)")
    ap.add_argument("--progress", type=int, default=100)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.cache:
        sys.path.insert(0, ".")
        from intent_mpc_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
    import jax.numpy as jnp

    from intent_mpc_tpu.utils.hostlimits import (current_map_count,
                                                 max_map_count)
    print(f"map limit {max_map_count()}, baseline {current_map_count()}",
          flush=True)

    if args.kind == "engine":
        # real engine programs: each compile pins ~1.8k mappings; with the
        # default 65,530 ceiling the process aborts after ~35 of these
        from intent_mpc_tpu.utils.config import small_config
        from intent_mpc_tpu.models.world import (generate_scenario,
                                                 straight_line_ref_traj)
        from intent_mpc_tpu.engine.closed_loop import run_episode
        for i in range(args.n):
            cfg = small_config(num_obstacles=4 + i % 7, horizon=5 + i // 7,
                               timeout=0.5, max_obstacles=4 + i % 7, hist=8)
            sc = generate_scenario(seed=0, cfg=cfg.world)
            r = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
            run_episode(cfg, sc, r, jnp.asarray(r.shape[0]))
            print(i + 1, current_map_count(), flush=True)
        print("completed", args.n, flush=True)
        return

    s = args.size
    x = jnp.ones((s, s), jnp.float32)

    for i in range(args.n):
        # distinct constant -> distinct program identity (no jit-cache hit);
        # the shape stays fixed so compile cost is uniform across i
        c = float(i + 1)

        if args.kind == "scan":
            def prog(x, _c=c):
                def body(carry, _):
                    y = carry
                    for _ in range(args.depth):
                        y = y @ x + _c
                    return y, y.sum()
                out, ys = jax.lax.scan(body, x, None, length=8)
                return out.sum() + ys.sum()
        elif args.kind == "while":
            def prog(x, _c=c):
                def body(state):
                    k, y = state
                    return k + 1, y @ x + _c
                def cond(state):
                    return state[0] < args.depth
                _, y = jax.lax.while_loop(cond, body, (0, x))
                return y.sum()
        else:
            def prog(x, _c=c):
                y = x
                for _ in range(args.depth):
                    y = y @ x + _c
                return y.sum()

        jax.jit(prog)(x).block_until_ready()
        if (i + 1) % args.progress == 0:
            print(i + 1, current_map_count(), flush=True)
    print("completed", args.n, flush=True)


if __name__ == "__main__":
    main()

"""Scaling-efficiency study: throughput vs mesh size.

BASELINE.md asks for solves/s scaling efficiency at 1 chip / 1 host /
N hosts. With one physical chip available, this harness measures *weak
scaling* over a virtual device mesh (xla_force_host_platform_device_count
on CPU — the sharding program is identical to the multi-chip TPU program;
on a real pod slice the same code runs over ICI/DCN unchanged).

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m intent_mpc_tpu.benchmark.scaling --platform cpu
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def run_study(devices_list, per_device: int, cycles: int, obstacles: int,
              iters: int):
    from intent_mpc_tpu.utils.config import small_config
    from intent_mpc_tpu.models.world import straight_line_ref_traj
    from intent_mpc_tpu.parallel import sharding as sh

    cfg = small_config(num_obstacles=obstacles, horizon=10, timeout=2.0,
                       max_obstacles=obstacles, hist=16)
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    tl = jnp.asarray(ref.shape[0])

    rows = []
    base = None
    for nd in devices_list:
        B = nd * per_device
        scenarios = sh.stack_scenarios(cfg, range(B))
        mesh = sh.make_mesh(nd)

        def run():
            m, agg = sh.batch_rollout(cfg, scenarios, ref, tl, mesh=mesh,
                                      solver_iters=iters, num_cycles=cycles)
            jax.block_until_ready(m)
            return agg

        run()   # compile + warm
        run()   # settle caches
        t0 = time.time()
        run()
        dt = time.time() - t0
        solves = B * 6 * cycles
        sps = solves / dt
        if base is None:
            base = sps / nd
        rows.append({
            "devices": nd,
            "batch": B,
            "solves_per_sec": round(sps, 1),
            "per_device": round(sps / nd, 1),
            "weak_scaling_efficiency": round(sps / (base * nd), 3),
        })
    return rows


def main():  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=str, default="1,2,4,8")
    ap.add_argument("--per-device", type=int, default=4)
    ap.add_argument("--cycles", type=int, default=5)
    ap.add_argument("--obstacles", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    devs = [int(d) for d in args.devices.split(",")]
    avail = len(jax.devices())
    devs = [d for d in devs if d <= avail]
    rows = run_study(devs, args.per_device, args.cycles, args.obstacles,
                     args.iters)

    # compiler-verified communication inventory at the largest mesh
    from intent_mpc_tpu.utils.config import small_config
    from intent_mpc_tpu.models.world import straight_line_ref_traj
    from intent_mpc_tpu.parallel import sharding as sh
    cfg = small_config(num_obstacles=args.obstacles, horizon=10,
                       timeout=2.0, max_obstacles=args.obstacles, hist=16)
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    nd = devs[-1]
    scen = sh.stack_scenarios(cfg, range(nd * args.per_device))
    rep = sh.collective_report(cfg, scen, ref, jnp.asarray(ref.shape[0]),
                               sh.make_mesh(nd), solver_iters=args.iters,
                               num_cycles=args.cycles)
    print(json.dumps({"rows": rows, "collectives": rep["counts"],
                      "collective_bytes_per_fleet_episode":
                          rep["total_bytes"]}, indent=2))


if __name__ == "__main__":  # pragma: no cover
    main()

"""Real-perception-in-the-loop metrics delta: GT fake detector vs the
rendered-depth dynamicDetector stack on the same seeded worlds.

The reference switches the whole perception source with one flag
(use_fake_detector, mpcNavigation.cpp:129-136); the DYNUS benchmark runs
GT. This driver quantifies what the switch costs in closed-loop metrics:
each seed flies TWICE — once with ground-truth obstacle histories
(models/detector.py) and once where the only obstacle information is
depth frames rendered at the drone's pose (models/real_detector.py:
render -> DBSCAN -> KF tracks -> classification -> predictor) — and the
per-seed rows + aggregates land in summary.json.

Scenario notes: dynamic-only worlds (dynamic_ratio=1.0). Static obstacles
are out of scope for this delta because the real detector (correctly)
only publishes dynamic tracks — the reference handles statics through the
occupancy-mapping pipeline (depth integration), which is exercised by
test_mapping/test_sensor; mixing them here would measure the missing
map-integration wiring, not the detector.

Usage:
  python -m intent_mpc_tpu.benchmark.real_loop --seeds 0 1 2 3 4 5 6 7 \
      --obstacles 12 --timeout 30 --out results/real_loop
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax.numpy as jnp
import numpy as np

from intent_mpc_tpu.utils.config import IntentMPCConfig, RealDetectorConfig


def build_cfg(args) -> IntentMPCConfig:
    cfg = IntentMPCConfig()
    world = dataclasses.replace(
        cfg.world, num_obstacles=args.obstacles, dynamic_ratio=1.0,
        x_range=(4.0, args.corridor - 4.0), y_range=(-3.0, 3.0),
        z_range=(1.0, 2.0))
    rd = RealDetectorConfig(max_tracks=args.max_tracks,
                            max_detections=args.max_tracks)
    return cfg.replace(
        world=world, real_detector=rd,
        start=(0.0, 0.0, 1.5), goal=(args.corridor, 0.0, 1.5),
        planner=dataclasses.replace(cfg.planner,
                                    max_obstacles=args.max_obstacles),
        engine=dataclasses.replace(cfg.engine, timeout=args.timeout))


def main():  # pragma: no cover
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, nargs="+", default=list(range(8)))
    ap.add_argument("--obstacles", type=int, default=12)
    ap.add_argument("--corridor", type=float, default=30.0)
    ap.add_argument("--timeout", type=float, default=30.0)
    ap.add_argument("--max-obstacles", type=int, default=16)
    ap.add_argument("--max-tracks", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default="results/real_loop")
    args = ap.parse_args()

    if args.cpu:
        import jax
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
    modes = {
        "gt": cfg,
        "real": cfg.replace(engine=dataclasses.replace(
            cfg.engine, use_fake_detector=False)),
    }
    out = {"config": {"obstacles": args.obstacles, "corridor": args.corridor,
                      "timeout": args.timeout, "seeds": args.seeds,
                      "max_tracks": args.max_tracks}}
    for name, c in modes.items():
        rows = []
        for seed in args.seeds:
            sc = generate_scenario(seed=seed, cfg=c.world)
            t0 = time.time()
            carry, _ = run_episode(c, sc, ref, traj_len)
            row = summarize(c, carry)
            row["seed"] = seed
            row["wall_s"] = round(time.time() - t0, 1)
            if name == "real":
                votes = np.asarray(carry.real_det.tracks.dyn_votes)
                row["tracks_dynamic"] = int((votes >= 2.0).sum())
            rows.append(row)
            print(f"[{name} seed {seed}] goal={row['goal_reached']} "
                  f"col={row['collision']} t={row['flight_travel_time']:.1f} "
                  f"mind={row['min_distance_to_obstacles']:.2f} "
                  f"({row['wall_s']}s)", flush=True)
        out[name] = H.aggregate(rows)
        out[name + "_rows"] = rows

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "summary.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps({k: out[k] for k in ("gt", "real")}, indent=1,
                     default=float))
    print("wrote", path)


if __name__ == "__main__":
    main()

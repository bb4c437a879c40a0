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

Two world modes:

  * micro (default, round-4): dynamic-only worlds (dynamic_ratio=1.0) in
    a narrow corridor — isolates the detector delta.
  * --dynus (round 5, VERDICT r4 item 2a): the full DYNUS protocol
    geometry — 200 obstacles, 65% dynamic trefoil + static pillars/
    walls, 105 m corridor, 100 s. In real mode the statics are handled
    the way the reference's real-perception stack handles them: a
    prebuilt static occupancy map (occupancyMap.cpp:399-475
    initPrebuiltMap) + per-cycle local clustering into rotated-box MPC
    rows (PlannerConfig.static_clustering, getStaticObstacles
    semantics); dynamics flow camera -> DBSCAN -> KF tracks ->
    classification -> predictor. GT mode keeps everything through the
    fake detector like the DYNUS benchmark.

Per-seed real-mode rows include the perception-level quality metrics
(track-vs-GT RMSE, miss/spurious rates, track births —
closed_loop.perception_summary).

Usage:
  python -m intent_mpc_tpu.benchmark.real_loop --seeds 0 1 2 3 4 5 6 7 \
      --obstacles 12 --timeout 30 --out results/real_loop
  python -m intent_mpc_tpu.benchmark.real_loop --dynus --seeds $(seq 0 31) \
      --timeout 100 --out results/real_loop_dynus
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
    rd = RealDetectorConfig(max_tracks=args.max_tracks,
                            max_detections=args.max_tracks)
    if args.dynus:
        # full DYNUS protocol world (WorldConfig defaults); statics are
        # physical scenario boxes, so the camera's box render images
        # them — no grid ray-march (render_static_grid=False)
        world = dataclasses.replace(
            cfg.world, num_obstacles=args.obstacles,
            dynamic_ratio=args.dynamic_ratio)
        return cfg.replace(
            world=world, real_detector=rd,
            planner=dataclasses.replace(cfg.planner,
                                        max_obstacles=args.max_obstacles),
            engine=dataclasses.replace(cfg.engine, timeout=args.timeout,
                                       render_static_grid=False))
    world = dataclasses.replace(
        cfg.world, num_obstacles=args.obstacles, dynamic_ratio=1.0,
        x_range=(4.0, args.corridor - 4.0), y_range=(-3.0, 3.0),
        z_range=(1.0, 2.0))
    return cfg.replace(
        world=world, real_detector=rd,
        start=(0.0, 0.0, 1.5), goal=(args.corridor, 0.0, 1.5),
        planner=dataclasses.replace(cfg.planner,
                                    max_obstacles=args.max_obstacles),
        engine=dataclasses.replace(cfg.engine, timeout=args.timeout))


def static_grid_for(sc, resolution=0.2, inflation=(0.3, 0.3, 0.2)):
    """Prebuilt static occupancy map of a DYNUS scenario's pillars/walls
    (the reference's prebuilt-map mode, occupancyMap.cpp:399-475), with
    the standard robot-size inflation (pass inflation=(0,0,0) for the
    SOLID volume — the classification-veto grid). Fixed extents so every
    seed compiles to the same program."""
    import numpy as np
    from intent_mpc_tpu.models.occupancy import build_from_static_obstacles
    st = np.asarray(sc.is_static)
    centers = np.asarray(sc.origin)[st]
    boxes = np.asarray(sc.bbox)[st]
    return build_from_static_obstacles(
        (-2.0, -16.5, 0.0), (112.0, 33.0, 7.6), resolution,
        centers, boxes, inflation=inflation)


def main():  # pragma: no cover
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, nargs="+", default=list(range(8)))
    ap.add_argument("--obstacles", type=int, default=12)
    ap.add_argument("--corridor", type=float, default=30.0)
    ap.add_argument("--timeout", type=float, default=30.0)
    ap.add_argument("--max-obstacles", type=int, default=16)
    ap.add_argument("--max-tracks", type=int, default=8)
    ap.add_argument("--dynamic-ratio", type=float, default=0.65,
                    help="--dynus world dynamic fraction (protocol 0.65)")
    ap.add_argument("--dynus", action="store_true",
                    help="full DYNUS protocol world (200 obstacles, "
                         "105 m, statics via prebuilt map + clustering "
                         "in real mode); pair with --obstacles 200 "
                         "--timeout 100 --max-obstacles 64 "
                         "--max-tracks 16")
    ap.add_argument("--static-veto", action="store_true",
                    help="RealDetectorConfig.static_map_veto: tracks "
                         "inside the prebuilt static map's occupied "
                         "cells are not classified dynamic (the statics "
                         "already reach the MPC via clustering rows)")
    ap.add_argument("--kf-inflate", type=float, default=None,
                    help="RealDetectorConfig.kf_size_inflation: report "
                         "track sizes inflated by this multiple of the "
                         "KF position std (uncertainty-aware margin)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default="results/real_loop")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from intent_mpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from intent_mpc_tpu.benchmark import harness as H
    from intent_mpc_tpu.engine.closed_loop import (perception_summary,
                                                   run_episode, summarize)
    from intent_mpc_tpu.models.world import (generate_scenario,
                                             straight_line_ref_traj)

    cfg = build_cfg(args)
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    traj_len = jnp.asarray(ref.shape[0])
    real_cfg = cfg.replace(engine=dataclasses.replace(
        cfg.engine, use_fake_detector=False))
    if args.dynus:
        # real mode at protocol scale: statics via prebuilt map +
        # per-cycle local clustering rows (getStaticObstacles semantics)
        real_cfg = real_cfg.replace(planner=dataclasses.replace(
            real_cfg.planner, static_clustering=True))
    if args.static_veto:
        real_cfg = real_cfg.replace(real_detector=dataclasses.replace(
            real_cfg.real_detector, static_map_veto=True))
    if args.kf_inflate is not None:
        real_cfg = real_cfg.replace(real_detector=dataclasses.replace(
            real_cfg.real_detector, kf_size_inflation=args.kf_inflate))
    modes = {"gt": cfg, "real": real_cfg}
    # --dynus uses the WorldConfig protocol corridor (105 m); the
    # --corridor arg only shapes the small-world mode
    out = {"config": {"obstacles": args.obstacles,
                      "corridor": ("dynus-105m" if args.dynus
                                   else args.corridor),
                      "timeout": args.timeout, "seeds": args.seeds,
                      "max_tracks": args.max_tracks, "dynus": args.dynus,
                      "dynamic_ratio": (args.dynamic_ratio if args.dynus
                                        else 1.0),
                      "max_obstacles": args.max_obstacles}}
    for name, c in modes.items():
        rows = []
        for seed in args.seeds:
            sc = generate_scenario(seed=seed, cfg=c.world)
            occ = veto = None
            if args.dynus and name == "real":
                occ = static_grid_for(sc)
                if args.static_veto:
                    # veto against the SOLID static volume, not the
                    # robot-inflated planning grid (see episode_step's
                    # veto_occ note / results/real_dynus28_veto seed 21)
                    veto = static_grid_for(sc, inflation=(0.0, 0.0, 0.0))
            t0 = time.time()
            # heavy per-cycle program (render/DBSCAN per hist tick):
            # chunk dispatches on the TPU tunnel (crash-envelope notes)
            carry, _ = run_episode(c, sc, ref, traj_len, occ=occ,
                                   chunk_cycles=None if args.cpu else 100,
                                   veto_occ=veto)
            row = summarize(c, carry)
            row["seed"] = seed
            row["wall_s"] = round(time.time() - t0, 1)
            if name == "real":
                votes = np.asarray(carry.real_det.tracks.dyn_votes)
                row["tracks_dynamic"] = int((votes >= 2.0).sum())
                row.update(perception_summary(carry))
            rows.append(row)
            extra = (f" rmse={row.get('track_pos_rmse', 0):.2f} "
                     f"miss={row.get('missed_rate', 0):.2f} "
                     f"spur={row.get('spurious_rate', 0):.2f}"
                     if name == "real" else "")
            print(f"[{name} seed {seed}] goal={row['goal_reached']} "
                  f"col={row['collision']} t={row['flight_travel_time']:.1f} "
                  f"mind={row['min_distance_to_obstacles']:.2f}"
                  f"{extra} ({row['wall_s']}s)", flush=True)
        agg = H.aggregate(rows)
        if name == "real":
            for k in ("track_pos_rmse", "missed_rate", "spurious_rate",
                      "track_births"):
                vals = [r[k] for r in rows if k in r]
                if vals:
                    agg["avg_" + k] = float(np.mean(vals))
        out[name] = agg
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

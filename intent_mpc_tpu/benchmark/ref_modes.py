"""Goal-mode input-trajectory composition at fleet scale: straight-line
vs [RRT ->] corridor min-snap (mpcNavigation.cpp:239-290).

Seeded prebuilt-map worlds: a wall spans the corridor at mid-flight with
one gap whose position is seed-drawn; the wall exists only in the static
occupancy map (the reference's prebuilt-map mode), so the MPC's obstacle
rows never see it. Straight-line (linspace) input trajectories drive
into the replan-check monitor's stop+replan loop; the composed
global-planner mode (engine/ref_builder.py) routes the min-snap input
trajectory through the gap and the identical engine reaches the goal.

Usage:
  python -m intent_mpc_tpu.benchmark.ref_modes --seeds 0 1 2 3 4 5 6 7 \
      --out results/ref_modes
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np


def wall_world(seed: int):
    """Wall at x=4 over the full height band with a seed-positioned gap."""
    import jax.numpy as jnp
    from intent_mpc_tpu.models.occupancy import build_from_static_obstacles
    from intent_mpc_tpu.models.world import Scenario

    rng = np.random.RandomState(seed)
    # 2.0 m gap whose center is drawn OFF the straight line (|y| in
    # [1.2, 2.2], random side) so the linspace reference is always
    # blocked; after the 0.3 m map inflation the clear width is ~1.4 m,
    # comfortably above the 2x0.5 m corridor radius
    gap_c = rng.uniform(1.2, 2.2) * (1 if rng.rand() < 0.5 else -1)
    gap_lo, gap_hi = gap_c - 1.0, gap_c + 1.0
    segs = []
    if gap_lo > -3.4:
        c = (-3.4 + gap_lo) / 2.0
        segs.append(((4.0, c, 2.2), (0.6, gap_lo + 3.4, 4.4)))
    if gap_hi < 3.4:
        c = (gap_hi + 3.4) / 2.0
        segs.append(((4.0, c, 2.2), (0.6, 3.4 - gap_hi, 4.4)))
    centers = np.array([s[0] for s in segs], np.float32)
    boxes = np.array([s[1] for s in segs], np.float32)
    grid = build_from_static_obstacles(
        (-1.0, -4.5, 0.0), (11.0, 9.0, 4.6), 0.2, centers, boxes,
        inflation=(0.3, 0.3, 0.2))
    dummy_c = jnp.asarray([[50.0, 50.0, 1.0]], jnp.float32)
    sc = Scenario(
        origin=dummy_c, scale=jnp.zeros((1, 3), jnp.float32),
        offset=jnp.zeros(1, jnp.float32), slower=jnp.zeros(1, jnp.float32),
        bbox=jnp.full((1, 3), 0.5, jnp.float32),
        is_static=jnp.ones(1, bool))
    return sc, grid, (gap_lo + gap_hi) / 2.0


def run_dynus(args):
    """DYNUS-protocol goal-mode composition (VERDICT r4 item 2b): the
    full 200-obstacle seeded world — static pillars/walls rasterized
    into the prebuilt occupancy map AND constrained as detector rows,
    dynamic trefoil field through the GT detector — flown in goal mode
    with the composed [RRT -> corridor min-snap] input trajectory
    (ref_mode "global") vs the straight-line rebuild ("linspace"), 105 m
    start -> goal, 100 s cap."""
    import jax
    import jax.numpy as jnp
    from intent_mpc_tpu.benchmark.real_loop import static_grid_for
    from intent_mpc_tpu.engine.closed_loop import run_episode, summarize
    from intent_mpc_tpu.models.world import generate_scenario
    from intent_mpc_tpu.utils.config import IntentMPCConfig

    def goal_cfg(ref_mode):
        cfg = IntentMPCConfig()
        cfg = cfg.replace(
            world=dataclasses.replace(cfg.world,
                                      num_obstacles=args.obstacles),
            engine=dataclasses.replace(
                cfg.engine, timeout=args.timeout, goal_mode=True,
                ref_mode=ref_mode, ref_vel=5.0,
                # 105 m routes: coarser RRT steps so the 64-slot path cap
                # holds (105/2.5 = 42 nodes), wider shortcutting, deeper
                # iteration budget, corridor-scaled sampling margin
                ref_rrt_iters=2048, ref_rrt_step=2.5,
                ref_rrt_shortcut=12.0, ref_bounds_margin=6.0,
                ref_waypoints=12))
        return cfg

    # input-trajectory allocation: 105 m at 5 m/s = 21 s = 210 samples at
    # 0.1 s, plus detour/slow-corner margin
    L = 384
    out = {"rows": [], "config": {"obstacles": args.obstacles,
                                  "timeout": args.timeout,
                                  "seeds": args.seeds, "dynus": True}}
    for seed in args.seeds:
        cfg0 = goal_cfg("linspace")
        sc = generate_scenario(seed=seed, cfg=cfg0.world)
        grid = static_grid_for(sc)
        row = {"seed": seed}
        for mode in ("linspace", "global"):
            cfg = goal_cfg(mode)
            ref = jnp.zeros((L, 3), jnp.float32)
            t0 = time.time()
            carry, _ = run_episode(cfg, sc, ref, jnp.asarray(L), occ=grid,
                                   ref_key=jax.random.PRNGKey(1000 + seed),
                                   chunk_cycles=None if args.cpu else 100)
            s = summarize(cfg, carry)
            row[mode] = {k: s[k] for k in
                         ("goal_reached", "collision", "flight_travel_time",
                          "path_length", "min_distance_to_obstacles",
                          "stop_replans", "traj_collision_cycles")}
            row[mode]["wall_s"] = round(time.time() - t0, 1)
        out["rows"].append(row)
        print(f"[dynus seed {seed}] "
              f"linspace goal={row['linspace']['goal_reached']} "
              f"col={row['linspace']['collision']} | "
              f"global goal={row['global']['goal_reached']} "
              f"col={row['global']['collision']} "
              f"({row['linspace']['wall_s']}+{row['global']['wall_s']}s)",
              flush=True)

    n = len(out["rows"])
    out["summary"] = {
        "linspace_success": sum(r["linspace"]["goal_reached"]
                                for r in out["rows"]) / n,
        "global_success": sum(r["global"]["goal_reached"]
                              for r in out["rows"]) / n,
        "collisions": sum(r[m]["collision"] for r in out["rows"]
                          for m in ("linspace", "global")),
    }
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "summary.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps(out["summary"], indent=1))
    print("wrote", path)


def main():  # pragma: no cover
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, nargs="+", default=list(range(8)))
    ap.add_argument("--timeout", type=float, default=20.0)
    ap.add_argument("--dynus", action="store_true",
                    help="DYNUS-protocol goal-mode run (200-obstacle "
                         "world, statics in the occupancy map + dynamic "
                         "trefoil field, 105 m; pair with --timeout 100)")
    ap.add_argument("--obstacles", type=int, default=200)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default="results/ref_modes")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from intent_mpc_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.dynus:
        run_dynus(args)
        return
    import jax.numpy as jnp
    from intent_mpc_tpu.engine.closed_loop import run_episode, summarize
    from intent_mpc_tpu.utils.config import small_config

    def goal_cfg(ref_mode):
        cfg = small_config(num_obstacles=1, horizon=10,
                           timeout=args.timeout, max_obstacles=1, hist=12)
        cfg = cfg.replace(goal=(8.0, 0.0, 2.0))
        return cfg.replace(engine=dataclasses.replace(
            cfg.engine, goal_mode=True, ref_mode=ref_mode, ref_vel=1.5,
            ref_bounds_margin=2.5, ref_angular_vel=2.0))

    out = {"rows": []}
    for seed in args.seeds:
        sc, grid, gap_y = wall_world(seed)
        row = {"seed": seed, "gap_y": round(float(gap_y), 2)}
        for mode in ("linspace", "global"):
            cfg = goal_cfg(mode)
            # goal mode ignores the passed ref CONTENT (linspace rebuilds
            # the straight segment per cycle; composed modes write the
            # built min-snap into the array) — the shape is the input-
            # trajectory ALLOCATION, sized for the composed route:
            # ~detour distance / (ref_vel * ts) samples plus margin
            ref = jnp.zeros((96, 3), jnp.float32)
            t0 = time.time()
            carry, _ = run_episode(cfg, sc, ref, jnp.asarray(ref.shape[0]),
                                   occ=grid,
                                   ref_key=jax.random.PRNGKey(1000 + seed))
            s = summarize(cfg, carry)
            row[mode] = {k: s[k] for k in
                         ("goal_reached", "collision", "flight_travel_time",
                          "stop_replans", "traj_collision_cycles")}
            row[mode]["wall_s"] = round(time.time() - t0, 1)
        out["rows"].append(row)
        print(f"[seed {seed}] gap_y={row['gap_y']:+.2f} "
              f"linspace goal={row['linspace']['goal_reached']} "
              f"global goal={row['global']['goal_reached']} "
              f"({row['linspace']['wall_s']}+{row['global']['wall_s']}s)",
              flush=True)

    n = len(out["rows"])
    out["summary"] = {
        "linspace_success": sum(r["linspace"]["goal_reached"]
                                for r in out["rows"]) / n,
        "global_success": sum(r["global"]["goal_reached"]
                              for r in out["rows"]) / n,
        "collisions": sum(r[m]["collision"] for r in out["rows"]
                          for m in ("linspace", "global")),
    }
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "summary.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps(out["summary"], indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()

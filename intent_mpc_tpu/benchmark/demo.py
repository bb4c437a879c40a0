"""One-command demo: run a full DYNUS episode and save plot + metrics.

    python -m intent_mpc_tpu.benchmark.demo --seed 0 --out demo_out
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def main():  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--obstacles", type=int, default=200)
    ap.add_argument("--timeout", type=float, default=100.0)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--out", type=str, default="demo_out")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import dataclasses
    from intent_mpc_tpu.utils.config import IntentMPCConfig
    from intent_mpc_tpu.models.world import (generate_scenario,
                                             straight_line_ref_traj)
    from intent_mpc_tpu.engine.closed_loop import run_episode, summarize
    from intent_mpc_tpu.benchmark import viz

    cfg = IntentMPCConfig()
    cfg = cfg.replace(
        world=dataclasses.replace(cfg.world, num_obstacles=args.obstacles),
        engine=dataclasses.replace(cfg.engine, timeout=args.timeout))
    sc = generate_scenario(args.seed, cfg.world)
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)

    carry, path = run_episode(cfg, sc, ref, jnp.asarray(ref.shape[0]),
                              solver_iters=args.iters, record_path=True)
    s = summarize(cfg, carry)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, f"metrics_seed{args.seed}.json"),
              "w") as f:
        json.dump(s, f, indent=2)
    viz.plot_episode(
        cfg, sc, np.asarray(path),
        os.path.join(args.out, f"episode_seed{args.seed}.png"),
        title=(f"seed {args.seed}: "
               f"{'success' if s['goal_reached'] else 'timeout'} "
               f"in {s['flight_travel_time']:.1f}s, "
               f"{s['collision_count']} collisions"))
    print(json.dumps(s, indent=2))


if __name__ == "__main__":  # pragma: no cover
    main()

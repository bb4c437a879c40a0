"""DYNUS-style seeded obstacle world as pure arrays.

Replaces the ROS obstacle node (dynus_obstacles_ros1/src/dynus_obstacles_node.cpp)
with a pure function of time: obstacle kinematics are closed-form trefoil
knots, so the whole world state at any `t` is a vectorized expression —
no 50 Hz publisher needed, and the world is trivially batchable over
scenarios with vmap.

Scenario generation reproduces the reference's std::mt19937 draw sequence
exactly (see utils/rng.py), so seed N here produces the same obstacle field
as seed N in the reference benchmark.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from intent_mpc_tpu.utils.config import WorldConfig
from intent_mpc_tpu.utils.rng import MT19937


class Scenario(NamedTuple):
    """Static per-scenario obstacle parameters (all shape (N,) or (N,3)).

    Mirrors ObstacleSpec (dynus_obstacles_node.h / .cpp:92-148):
    dynamic obstacles follow trefoil knots; static obstacles hold position.
    """

    origin: jnp.ndarray      # (N, 3) x0, y0, z0
    scale: jnp.ndarray       # (N, 3) sx, sy, sz (0 for static)
    offset: jnp.ndarray      # (N,)   trefoil phase offset
    slower: jnp.ndarray      # (N,)   time dilation (0 for static)
    bbox: jnp.ndarray        # (N, 3) obstacle bounding-box size
    is_static: jnp.ndarray   # (N,)   bool


def generate_scenario(seed: int, cfg: WorldConfig) -> Scenario:
    """Seeded world generation (dynus_obstacles_node.cpp:73-152).

    Draw order per obstacle: x, y, z uniforms always; dynamic obstacles
    additionally draw sx, sy, sz, offset, slower.
    """
    rng = MT19937(seed)
    n = cfg.num_obstacles
    num_dynamic = int(n * cfg.dynamic_ratio)
    num_static = n - num_dynamic

    origin = np.zeros((n, 3))
    scale = np.zeros((n, 3))
    offset = np.zeros(n)
    slower = np.zeros(n)
    bbox = np.zeros((n, 3))
    is_static = np.zeros(n, dtype=bool)

    for i in range(n):
        static = i >= num_dynamic
        x = rng.uniform(*cfg.x_range)
        y = rng.uniform(*cfg.y_range)
        z = rng.uniform(*cfg.z_range)
        if static:
            static_idx = i - num_dynamic
            is_vertical = static_idx < (num_static * cfg.percentage_vert)
            if is_vertical:
                bbox[i] = cfg.bbox_static_vert
                z = cfg.bbox_static_vert[2] / 2.0  # pillar sits on the ground
            else:
                bbox[i] = cfg.bbox_static_horiz
            origin[i] = (x, y, z)
            is_static[i] = True
        else:
            bbox[i] = cfg.bbox_dynamic
            origin[i] = (x, y, z)
            scale[i, 0] = rng.uniform(*cfg.scale_range)
            scale[i, 1] = rng.uniform(*cfg.scale_range)
            scale[i, 2] = rng.uniform(*cfg.scale_range)
            offset[i] = rng.uniform(*cfg.offset_range)
            slower[i] = rng.uniform(*cfg.slower_range)

    return Scenario(
        origin=jnp.asarray(origin, jnp.float32),
        scale=jnp.asarray(scale, jnp.float32),
        offset=jnp.asarray(offset, jnp.float32),
        slower=jnp.asarray(slower, jnp.float32),
        bbox=jnp.asarray(bbox, jnp.float32),
        is_static=jnp.asarray(is_static),
    )


def obstacle_state(sc: Scenario, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form obstacle positions/velocities at time t.

    Trefoil knot (dynus_obstacles_node.cpp:5-26):
      x = (sx/6)(sin tt + 2 sin 2tt) + x0
      y = (sy/5)(cos tt - 2 cos 2tt) + y0
      z = (sz/2)(-sin 3tt) + z0,  tt = t/slower + offset

    Returns (pos (N,3), vel (N,3)); static obstacles hold origin, zero vel.
    """
    safe_slower = jnp.where(sc.is_static, 1.0, sc.slower)
    tt = t / safe_slower + sc.offset
    sx, sy, sz = sc.scale[:, 0], sc.scale[:, 1], sc.scale[:, 2]

    px = (sx / 6.0) * (jnp.sin(tt) + 2.0 * jnp.sin(2.0 * tt)) + sc.origin[:, 0]
    py = (sy / 5.0) * (jnp.cos(tt) - 2.0 * jnp.cos(2.0 * tt)) + sc.origin[:, 1]
    pz = (sz / 2.0) * (-jnp.sin(3.0 * tt)) + sc.origin[:, 2]

    inv = 1.0 / safe_slower
    vx = (sx / 6.0) * inv * (jnp.cos(tt) + 4.0 * jnp.cos(2.0 * tt))
    vy = (sy / 5.0) * inv * (-jnp.sin(tt) + 4.0 * jnp.sin(2.0 * tt))
    vz = -(3.0 * sz / 2.0) * inv * jnp.cos(3.0 * tt)

    pos = jnp.stack([px, py, pz], axis=-1)
    vel = jnp.stack([vx, vy, vz], axis=-1)
    static = sc.is_static[:, None]
    pos = jnp.where(static, sc.origin, pos)
    vel = jnp.where(static, 0.0, vel)
    return pos, vel


def straight_line_ref_traj(start, goal, spacing: float = 2.5) -> jnp.ndarray:
    """Reference trajectory matching ref_trajectory_dynus_benchmark.txt:
    waypoints every `spacing` meters from start to goal (the benchmark file
    spaces waypoints 2.5 m apart). Note the reference MPC's updatePath
    treats consecutive waypoints as ts=0.1 s apart regardless of the file's
    time column (mpcNavigation.cpp:229-231), so the reference acts as a
    fast-moving carrot; we reproduce that protocol.
    """
    start = np.asarray(start, np.float64)
    goal = np.asarray(goal, np.float64)
    dist = float(np.linalg.norm(goal - start))
    n = max(2, int(np.ceil(dist / spacing - 1e-9)) + 1)
    alphas = np.linspace(0.0, 1.0, n)[:, None]
    pts = start[None, :] * (1 - alphas) + goal[None, :] * alphas
    return jnp.asarray(pts, jnp.float32)


def load_ref_traj(path: str) -> jnp.ndarray:
    """Load a `t x y z` whitespace trajectory file
    (format of mpcNavigation::getRefTraj, mpcNavigation.cpp:190-220)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 4:
                break
            rows.append([float(parts[1]), float(parts[2]), float(parts[3])])
    return jnp.asarray(np.array(rows), jnp.float32)

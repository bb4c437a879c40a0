"""B-spline trajectory optimizer tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.models import bspline_traj as bs
from intent_mpc_tpu.models.occupancy import build_from_static_obstacles
from intent_mpc_tpu.models import mapping


def _line_path(n=20):
    xs = np.linspace(0, 8, n)
    return jnp.asarray(np.stack([xs, np.zeros(n), np.full(n, 1.5)], -1))


def test_smoothness_only_keeps_line():
    cfg = bs.BsplineConfig(iters=50)
    ctrl0 = bs.fit_control_points(_line_path())
    tr = bs.optimize(cfg, ctrl0)
    # straight line is already smooth: control points stay near the line
    c = np.asarray(tr.ctrl)
    assert np.abs(c[:, 1]).max() < 1e-3
    p = np.asarray(bs.evaluate(tr, jnp.asarray(0.0)))
    np.testing.assert_allclose(p, [0, 0, 1.5], atol=1e-4)


def test_static_collision_pushes_away():
    grid = build_from_static_obstacles(
        origin=(-1, -3, 0), size_m=(10, 6, 3), resolution=0.2,
        centers=[[4.0, 0.0, 1.5]], bboxes=[[1.0, 1.0, 3.0]],
        inflation=[0.2, 0.2, 0.2])
    d = mapping.esdf(grid.grid, 0.2)
    cfg = bs.BsplineConfig(iters=300, clearance=0.6)
    # slightly off-axis path (a perfectly centered line sits on the ESDF's
    # symmetric saddle, where the lateral gradient is exactly zero — the
    # reference avoids this by initializing from an A* guide path)
    n = 20
    xs = np.linspace(0, 8, n)
    path = jnp.asarray(np.stack([xs, np.full(n, 0.1), np.full(n, 1.5)], -1))
    ctrl0 = bs.fit_control_points(path)
    tr = bs.optimize(cfg, ctrl0, esdf_grid=d, esdf_origin=(-1, -3, 0),
                     esdf_resolution=0.2)
    c = np.asarray(tr.ctrl)
    # mid control points near the obstacle must deviate
    mid = c[(np.abs(c[:, 0] - 4.0) < 1.2)]
    assert np.abs(mid[:, 1]).max() > 0.3 or np.abs(mid[:, 2] - 1.5).max() > 0.3


def test_dynamic_obstacle_penalty():
    cfg = bs.BsplineConfig(iters=300)
    xs = np.linspace(0, 8, 20)
    path = jnp.asarray(np.stack([xs, np.full(20, 0.05), np.full(20, 1.5)], -1))
    ctrl0 = bs.fit_control_points(path)
    P = ctrl0.shape[0]
    obs_pos = jnp.broadcast_to(jnp.array([4.0, 0.0, 1.5]), (1, P, 3))
    obs_size = jnp.broadcast_to(jnp.array([1.0, 1.0, 1.0]), (1, P, 3))
    tr = bs.optimize(cfg, ctrl0, obstacle_pos=obs_pos, obstacle_size=obs_size)
    c = np.asarray(tr.ctrl)
    mid = c[(np.abs(c[:, 0] - 4.0) < 1.5)]
    dist = np.linalg.norm(mid - np.array([4.0, 0.0, 1.5]), axis=-1)
    assert dist.min() > 0.5


def test_feasibility_limits_velocity():
    # widely-spaced waypoints at dt=0.1 imply v >> vmax; optimizer shrinks
    xs = np.linspace(0, 40, 15)
    path = jnp.asarray(np.stack([xs, np.zeros(15), np.ones(15)], -1))
    cfg = bs.BsplineConfig(iters=300, w_feasibility=10.0)
    tr = bs.optimize(cfg, bs.fit_control_points(path))
    c = np.asarray(tr.ctrl)
    v = np.abs(np.diff(c[3:-3], axis=0) / 0.1)
    # interior velocities pulled toward the limit (cannot fully satisfy with
    # pinned endpoints, but must be well below the raw 20+ m/s)
    assert np.percentile(v[:, 0], 50) < 40.0

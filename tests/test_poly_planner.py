"""polyTrajOccMap-equivalent planning loop tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.models import poly_planner, poly_traj
from intent_mpc_tpu.models.occupancy import (build_from_static_obstacles,
                                             empty_grid, is_occupied)


def _path():
    xs = np.linspace(0, 6, 7)
    return jnp.asarray(np.stack([xs, np.zeros(7), np.full(7, 1.5)], -1))


def test_clear_map_first_iteration_valid():
    cfg = poly_planner.PolyPlanConfig(
        poly=poly_traj.PolyTrajConfig(max_iter=300))
    res = poly_planner.plan(cfg, _path(), 2.0, empty_grid())
    assert bool(res.valid)
    assert not bool(res.used_failsafe)
    p = poly_planner.sample(res, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(p), [0, 0, 1.5], atol=3e-2)


def test_obstacle_triggers_corridor_shrink_or_failsafe():
    # wall with a gap below: waypoint line passes next to an occupied block
    grid = build_from_static_obstacles(
        origin=(-1, -3, 0), size_m=(9, 6, 3), resolution=0.2,
        centers=[[3.0, 0.6, 1.5]], bboxes=[[0.6, 0.8, 3.0]],
        inflation=[0.1, 0.1, 0.1])
    cfg = poly_planner.PolyPlanConfig(
        poly=poly_traj.PolyTrajConfig(max_iter=300))
    res = poly_planner.plan(cfg, _path(), 2.0, grid)
    # either a shrunk-corridor polynomial or the pwl failsafe; in both
    # cases the sampled plan must avoid the obstacle
    dur = float(res.traj.times[-1]) if bool(res.valid) \
        else float(res.failsafe.duration)
    ts = np.linspace(0, dur * 0.999, 60)
    pts = np.stack([np.asarray(poly_planner.sample(res, jnp.asarray(t)))
                    for t in ts])
    occ_hits = np.asarray(is_occupied(grid, jnp.asarray(pts)))
    if bool(res.valid):
        assert not occ_hits.any()
    else:
        assert bool(res.used_failsafe)

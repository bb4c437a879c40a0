"""Full clicked-goal stack: RRT global plan -> min-snap smoothing -> MPC
closed loop (the reference's use_global_planner mode, mpcNavigation.cpp
initModules wiring rrtOccMap -> polyTrajOccMap -> mpcPlanner)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intent_mpc_tpu.engine.closed_loop import run_episode, summarize
from intent_mpc_tpu.models import poly_traj
from intent_mpc_tpu.models.global_planner import RRTConfig, rrt_plan
from intent_mpc_tpu.models.occupancy import build_from_static_obstacles
from intent_mpc_tpu.models.world import Scenario
from intent_mpc_tpu.utils.config import small_config


def _pillar_world():
    """Three static pillars forming a partial wall across the corridor
    at x=4; a gap at y>1.2 lets a planned path through."""
    centers = np.array([[4.0, -1.6, 1.25], [4.0, -0.4, 1.25],
                        [4.0, 0.8, 1.25]], np.float32)
    bbox = np.array([[0.5, 0.9, 2.5]] * 3, np.float32)
    n = len(centers)
    sc = Scenario(
        origin=jnp.asarray(centers),
        scale=jnp.zeros((n, 3), jnp.float32),
        offset=jnp.zeros(n, jnp.float32),
        slower=jnp.zeros(n, jnp.float32),
        bbox=jnp.asarray(bbox),
        is_static=jnp.ones(n, bool))
    grid = build_from_static_obstacles(
        (-1.0, -4.0, 0.0), (11.0, 8.0, 4.0), 0.2, centers, bbox,
        inflation=(0.4, 0.4, 0.2))
    return sc, grid


@pytest.mark.slow
def test_global_planner_to_mpc_pipeline():
    sc, grid = _pillar_world()
    cfg = small_config(num_obstacles=3, horizon=10, timeout=8.0,
                       max_obstacles=3, hist=12)
    cfg = cfg.replace(goal=(8.0, 0.0, 2.0))

    # 1. global plan around the pillar wall (rrtOccMap::makePlan)
    r = jax.jit(lambda: rrt_plan(
        grid, jnp.asarray(cfg.start, jnp.float32),
        jnp.asarray(cfg.goal, jnp.float32),
        (0.0, -3.0, 0.5), (9.0, 3.0, 3.0), jax.random.PRNGKey(3),
        RRTConfig(max_iters=600, incremental_dist=0.5)))()
    assert bool(r.success)
    n_wp = int(r.length)
    wps = np.asarray(r.path)[:n_wp]

    # 2. min-snap smoothing over the RRT waypoints (polyTrajOccMap)
    tr = poly_traj.plan(jnp.asarray(wps), desired_vel=1.5)
    total_t = float(jnp.sum(tr.times))
    # sample into the MPC's reference-waypoint protocol
    ts = jnp.linspace(0.0, total_t, 40)
    ref = jnp.stack([poly_traj.sample(tr, t) for t in ts])
    # smoothed path must itself be collision-free on the grid
    from intent_mpc_tpu.models.occupancy import is_occupied
    assert not bool(jnp.any(is_occupied(grid, ref)))

    # 3. MPC closed loop tracks the smoothed global path
    carry, _ = run_episode(cfg, sc, ref, jnp.asarray(ref.shape[0]),
                           solver_iters=60)
    s = summarize(cfg, carry)
    assert s["goal_reached"], s
    assert not s["collision"], s
    # the flight detoured around the wall, not through it
    assert s["path_length"] > 8.0

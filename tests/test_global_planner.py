"""Global planner tests: RRT, PRM, grid wavefront on a walled map."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.models import global_planner as gp
from intent_mpc_tpu.models.occupancy import (OccupancyGrid,
                                             build_from_static_obstacles,
                                             is_occupied)


@pytest.fixture(scope="module")
def walled_map():
    # 10x10x3 m world with a wall at x=5 leaving a gap at y in [7,9]
    grid = build_from_static_obstacles(
        origin=(0, 0, 0), size_m=(10, 10, 3), resolution=0.25,
        centers=[[5.0, 3.5, 1.5]], bboxes=[[0.5, 7.0, 3.0]],
        inflation=[0.2, 0.2, 0.2])
    return grid


def _check_path(occ, res, start, goal):
    pts = np.asarray(res.path)
    n = int(res.length)
    assert bool(res.success)
    np.testing.assert_allclose(pts[0], start, atol=0.6)
    np.testing.assert_allclose(pts[n - 1], goal, atol=0.6)
    # every segment collision-free
    for i in range(n - 1):
        fr = np.linspace(0, 1, 20)[:, None]
        seg = pts[i][None, :] * (1 - fr) + pts[i + 1][None, :] * fr
        assert not bool(jnp.any(is_occupied(occ, jnp.asarray(seg)))), i


def test_rrt_finds_path_around_wall(walled_map):
    start = jnp.array([1.0, 2.0, 1.5])
    goal = jnp.array([9.0, 2.0, 1.5])
    res = gp.rrt_plan(walled_map, start, goal, (0.3, 0.3, 0.5),
                      (9.7, 9.7, 2.5), jax.random.key(0),
                      gp.RRTConfig(max_iters=800))
    _check_path(walled_map, res, np.asarray(start), np.asarray(goal))
    # the path must route through the gap (y > 6.5 somewhere)
    pts = np.asarray(res.path)[: int(res.length)]
    assert pts[:, 1].max() > 6.0


def test_rrt_is_deterministic_given_key(walled_map):
    start = jnp.array([1.0, 2.0, 1.5])
    goal = jnp.array([9.0, 2.0, 1.5])
    r1 = gp.rrt_plan(walled_map, start, goal, (0.3, 0.3, 0.5),
                     (9.7, 9.7, 2.5), jax.random.key(7))
    r2 = gp.rrt_plan(walled_map, start, goal, (0.3, 0.3, 0.5),
                     (9.7, 9.7, 2.5), jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(r1.path), np.asarray(r2.path))


def test_rrt_star_finds_path_and_rewires_shorter(walled_map):
    start = jnp.array([1.0, 2.0, 1.5])
    goal = jnp.array([9.0, 2.0, 1.5])
    res = gp.rrt_star_plan(walled_map, start, goal, (0.3, 0.3, 0.5),
                           (9.7, 9.7, 2.5), jax.random.key(0),
                           gp.RRTStarConfig(max_iters=800))
    _check_path(walled_map, res, np.asarray(start), np.asarray(goal))

    def plen(r):
        p = np.asarray(r.path)[: int(r.length)]
        return np.linalg.norm(np.diff(p, axis=0), axis=-1).sum()

    # averaged over keys, rewired trees must not be longer than raw RRT
    # paths before shortcutting (compare against un-shortcut RRT by using
    # 0 shortcut rounds)
    raw = gp.RRTConfig(max_iters=800, shortcut_rounds=0,
                       max_shortcut_dist=0.0)
    star_lens, rrt_lens = [], []
    for k in range(3):
        rs = gp.rrt_star_plan(walled_map, start, goal, (0.3, 0.3, 0.5),
                              (9.7, 9.7, 2.5), jax.random.key(k),
                              gp.RRTStarConfig(max_iters=800))
        rr = gp.rrt_plan(walled_map, start, goal, (0.3, 0.3, 0.5),
                         (9.7, 9.7, 2.5), jax.random.key(k), raw)
        if bool(rs.success) and bool(rr.success):
            star_lens.append(plen(rs))
            rrt_lens.append(plen(rr))
    assert star_lens, "no common successes"
    assert np.mean(star_lens) <= np.mean(rrt_lens) + 1e-3


def test_prm_finds_path(walled_map):
    start = jnp.array([1.0, 2.0, 1.5])
    goal = jnp.array([9.0, 2.0, 1.5])
    res = gp.prm_plan(walled_map, start, goal, (0.3, 0.3, 0.5),
                      (9.7, 9.7, 2.5), jax.random.key(1))
    _check_path(walled_map, res, np.asarray(start), np.asarray(goal))


def test_grid_wavefront_costs(walled_map):
    cost = gp.grid_wavefront(walled_map.grid, (4, 8, 6), (36, 8, 6),
                             iters=120)
    c = np.asarray(cost)
    assert c[36, 8, 6] == 0.0
    assert np.isfinite(c[4, 8, 6]) and c[4, 8, 6] < 1e8
    # blocked voxels unreachable
    assert c[20, 14, 6] >= 1e8  # inside the wall

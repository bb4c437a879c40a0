"""Octomap-equivalent pyramid: tri-state semantics, depth queries,
hierarchical segment checks, and unknown-aware planning (the
rrtOctomap/rrtStarOctomap capabilities: rrtOctomap.h:313-365)."""

import jax
import jax.numpy as jnp
import numpy as np

from intent_mpc_tpu.models import octo
from intent_mpc_tpu.models.global_planner import (
    RRTConfig, occupied_at, rrt_plan)
from intent_mpc_tpu.models.mapping import (
    LogOddsMap, MappingConfig, init_map, integrate_cloud)
from intent_mpc_tpu.models.occupancy import build_from_static_obstacles


def _observed_map_with_wall():
    """A 6x6x3 m map: everything observed free except a wall slab at
    x in [2.4, 3.0), plus an unobserved (never-rayed) block at
    y in [4.5, 6.0)."""
    cfg = MappingConfig(resolution=0.3)
    m = init_map((0.0, 0.0, 0.0), (6.0, 6.0, 3.0), cfg)
    lo = np.zeros(m.log_odds.shape, np.float32)
    lo[:] = cfg.l_min          # observed free
    lo[8:10, :, :] = cfg.l_max  # occupied wall
    lo[:, 15:, :] = 0.0        # never observed
    lo[8:10, 15:, :] = 0.0
    m = m._replace(log_odds=jnp.asarray(lo))
    return cfg, m


def test_tri_state_point_queries():
    cfg, m = _observed_map_with_wall()
    o = octo.from_log_odds(m, cfg, levels=3, ignore_unknown=True)

    free_p = jnp.array([1.0, 1.0, 1.0])
    occ_p = jnp.array([2.6, 1.0, 1.0])
    unk_p = jnp.array([1.0, 5.0, 1.0])

    assert not bool(octo.is_blocked(o, free_p))
    assert bool(octo.is_blocked(o, occ_p))
    # ignore_unknown=True: unknown space is passable (octomap NULL node
    # with ignoreUnknown)
    assert not bool(octo.is_blocked(o, unk_p))

    oc = o._replace(ignore_unknown=False)
    assert bool(octo.is_blocked(oc, unk_p))
    # out-of-map is NULL -> blocked for the conservative map
    assert bool(octo.is_blocked(oc, jnp.array([-5.0, 1.0, 1.0])))
    assert not bool(octo.is_blocked(o, jnp.array([-5.0, 1.0, 1.0])))


def test_pyramid_inner_max_policy():
    """Coarse cells report occupied iff any base descendant is occupied —
    exact max-pool pyramid (octomap inner-node max)."""
    cfg, m = _observed_map_with_wall()
    o = octo.from_log_odds(m, cfg, levels=3)
    base_occ = np.asarray(o.levels_occ[0])
    for lvl in (1, 2):
        s = 1 << lvl
        coarse = np.asarray(o.levels_occ[lvl])
        for i in range(coarse.shape[0]):
            for j in range(coarse.shape[1]):
                for k in range(coarse.shape[2]):
                    blk = base_occ[i * s:(i + 1) * s, j * s:(j + 1) * s,
                                   k * s:(k + 1) * s]
                    assert coarse[i, j, k] == (1 if blk.max() > 0 else 0)


def test_search_depth_levels():
    cfg, m = _observed_map_with_wall()
    o = octo.from_log_odds(m, cfg, levels=3)
    # a free base voxel sharing its coarse cell with the wall: free at the
    # base level, occupied at the 4-voxel level
    p = jnp.array([3.15, 1.0, 1.0])  # voxel x-index 10; wall at 8-9
    occ0, _ = octo.search(o, p, level=0)
    occ2, _ = octo.search(o, p, level=2)  # 4-voxel cells: 10 in cell 8-11
    assert int(occ0) == 0
    assert int(occ2) == 1
    # a voxel whose whole coarse cell is free stays free at every level
    q = jnp.array([0.5, 1.0, 1.0])
    assert int(octo.search(o, q, level=2)[0]) == 0


def test_segment_free_matches_fine_check():
    cfg, m = _observed_map_with_wall()
    o = octo.from_log_odds(m, cfg, levels=3)
    a = jnp.array([0.5, 1.0, 1.0])
    through_wall = jnp.array([5.5, 1.0, 1.0])
    along_wall = jnp.array([0.5, 3.5, 1.0])
    seg = jax.jit(lambda a, b: octo.segment_free(o, a, b, checks=32))
    assert not bool(seg(a, through_wall))
    assert bool(seg(a, along_wall))
    # box check: a point near the wall with a wide collision box collides
    assert bool(octo.box_blocked(o, jnp.array([2.1, 1.0, 1.0]),
                                 (0.8, 0.8, 0.4), 4))
    assert not bool(octo.box_blocked(o, jnp.array([1.0, 1.0, 1.0]),
                                     (0.8, 0.8, 0.4), 4))


def test_cast_ray_first_hit():
    cfg, m = _observed_map_with_wall()
    o = octo.from_log_odds(m, cfg, levels=3)
    hit, p = octo.cast_ray(o, jnp.array([0.5, 1.0, 1.0]),
                           jnp.array([5.5, 1.0, 1.0]))
    assert bool(hit)
    assert 2.3 <= float(p[0]) <= 2.8  # wall front face at x=2.4


def test_rrt_unknown_space_semantics():
    """The capability delta the octo backend closes: with
    ignore_unknown=False the planner must route around unexplored space;
    with ignore_unknown=True it may fly through it (rrtOctomap
    ignoreUnknown_)."""
    cfg, m = _observed_map_with_wall()
    # open a gap in the wall inside the UNKNOWN region only: the sole
    # route to the far side crosses unobserved voxels
    lo = np.asarray(m.log_odds).copy()
    lo[8:10, 15:, :] = 0.0  # wall section inside unknown region: unknown
    m = m._replace(log_odds=jnp.asarray(lo))

    start = jnp.array([1.0, 5.2, 1.0])
    goal = jnp.array([5.0, 5.2, 1.0])
    key = jax.random.PRNGKey(0)
    rcfg = RRTConfig(max_iters=400, incremental_dist=0.4)
    bounds_lo = (0.2, 0.2, 0.4)
    bounds_hi = (5.8, 5.8, 2.6)

    o_optimistic = octo.from_log_odds(m, cfg, levels=3, ignore_unknown=True)
    o_conservative = o_optimistic._replace(ignore_unknown=False)

    r_opt = jax.jit(lambda: rrt_plan(o_optimistic, start, goal, bounds_lo,
                                     bounds_hi, key, rcfg))()
    r_con = jax.jit(lambda: rrt_plan(o_conservative, start, goal, bounds_lo,
                                     bounds_hi, key, rcfg))()
    assert bool(r_opt.success)
    assert not bool(r_con.success)


def test_from_occupancy_grid_matches_grid_queries():
    g = build_from_static_obstacles(
        (0, 0, 0), (4.0, 4.0, 2.0), 0.2,
        centers=[(2.0, 2.0, 1.0)], bboxes=[(0.6, 0.6, 0.6)],
        inflation=(0.2, 0.2, 0.2))
    o = octo.from_occupancy_grid(g, levels=3)
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (256, 3)) * jnp.array([4.0, 4.0, 2.0])
    from intent_mpc_tpu.models.occupancy import is_occupied
    np.testing.assert_array_equal(np.asarray(is_occupied(g, pts)),
                                  np.asarray(octo.is_blocked(o, pts)))
    # planner dispatch accepts both backends
    np.testing.assert_array_equal(np.asarray(occupied_at(g, pts)),
                                  np.asarray(occupied_at(o, pts)))


def test_poly_planner_accepts_octo_backend():
    """polyTrajOctomap's role: the min-snap corridor planner runs over the
    octo backend through the same occupied_at dispatch as the RRT
    planners."""
    from intent_mpc_tpu.models import poly_planner
    cfg, m = _observed_map_with_wall()
    o = octo.from_log_odds(m, cfg, levels=3)
    wps = jnp.array([[0.5, 1.0, 1.0], [0.5, 5.0, 1.0]])  # clear of the wall
    res = poly_planner.plan(poly_planner.PolyPlanConfig(), wps,
                            desired_vel=1.0, occ=o)
    assert bool(res.valid)

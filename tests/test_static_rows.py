"""Static-obstacle MPC rows from map clustering (the real-perception
composition: statics reach the planner via static map ->
obstacleClustering -> rotated-box ellipsoid rows instead of the fake
detector; mpcPlanner.cpp getStaticObstacles + updateObstacleParam
:1186-1195)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from intent_mpc_tpu.models import clustering as clus
from intent_mpc_tpu.models import mpc as mpclib
from intent_mpc_tpu.models.occupancy import (build_from_static_obstacles,
                                             local_occupied_points)
from intent_mpc_tpu.utils.config import small_config


def _wall_grid():
    # wall at x=3 spanning y in [-2, 2], z in [0, 4]
    return build_from_static_obstacles(
        (-1.0, -4.0, 0.0), (10.0, 8.0, 4.6), 0.2,
        np.array([[3.0, 0.0, 2.0]], np.float32),
        np.array([[0.4, 4.0, 4.0]], np.float32),
        inflation=(0.3, 0.3, 0.2))


def test_local_occupied_points_finds_wall():
    g = _wall_grid()
    pts, valid = local_occupied_points(g, jnp.array([1.0, 0.0, 2.0]),
                                       (48, 48, 24), 256)
    assert pts.shape == (256, 3) and valid.shape == (256,)
    n = int(valid.sum())
    assert n > 50                      # the wall face is inside the window
    sel = np.asarray(pts)[np.asarray(valid)]
    # every selected point is an occupied (inflated) wall voxel near x=3
    assert np.all(np.abs(sel[:, 0] - 3.0) < 1.0)
    assert np.all(np.abs(sel[:, 1]) < 2.6)


def test_cluster_local_cloud_boxes_the_wall():
    g = _wall_grid()
    pts, valid = local_occupied_points(g, jnp.array([1.0, 0.0, 2.0]),
                                       (48, 48, 24), 256)
    so = clus.cluster_obstacles(
        clus.ClusteringConfig(max_clusters=4, tree_level=2, min_pts=8),
        pts, valid)
    act = np.asarray(so.active)
    assert act.any()
    cen = np.asarray(so.centroid)[act]
    # every active cluster centroid sits on the wall
    assert np.all(np.abs(cen[:, 0] - 3.0) < 1.0)


def test_static_rows_divert_plan():
    """A static wall box fed through static_obs must push the planned
    trajectory off the straight reference (the ellipsoid rows bind)."""
    cfg = small_config(num_obstacles=1, horizon=12, max_obstacles=1).planner
    cfg = dataclasses.replace(cfg, max_obstacles=1)
    state = mpclib.init_planner_state(cfg)
    # warm a first solution so first_time is cleared (the reference's
    # firstTime pass solves unconstrained, makePlanWithPred :593-602)
    ref = jnp.stack([jnp.linspace(jnp.zeros(3), jnp.array([8.0, 0.0, 2.0]),
                                  33)])[0]
    pred = mpclib.Prediction(
        pos=jnp.full((1, 4, cfg.horizon + 1, 3), 50.0),
        size=jnp.ones((1, 4, cfg.horizon + 1, 3)),
        intent_prob=jnp.full((1, 4), 0.25))
    visible = jnp.zeros(1, bool)
    pos0 = jnp.array([0.0, 0.0, 2.0])
    vel0 = jnp.zeros(3)
    out0 = mpclib.make_plan_with_pred(cfg, state, pos0, vel0, ref,
                                      jnp.asarray(33), pred, visible, 60)
    st = out0.state

    wall = (jnp.array([[3.0, 0.0, 2.0]]), jnp.array([[0.6, 1.6, 4.0]]),
            jnp.zeros(1), jnp.ones(1, bool))
    out_s = mpclib.make_plan_with_pred(cfg, st, pos0, vel0, ref,
                                       jnp.asarray(33), pred, visible, 60,
                                       static_obs=wall)
    out_n = mpclib.make_plan_with_pred(cfg, st, pos0, vel0, ref,
                                       jnp.asarray(33), pred, visible, 60)
    X_s = np.asarray(out_s.state.states_sol)
    X_n = np.asarray(out_n.state.states_sol)
    # without the wall the plan tracks the straight line; with it the
    # states bend away (any nonzero |y| growth / slower x progress)
    dev_s = np.abs(X_s[:, 0:3] - X_n[:, 0:3]).max()
    assert dev_s > 0.05, dev_s
    # and the deviation must be AWAY from the wall: the static plan keeps
    # a strictly larger normalized ellipsoid distance to the wall center
    # than the unconstrained plan (one 60-iteration cycle moves the
    # compromise iterate toward feasibility, not all the way — the
    # accept-iterate semantics the closed loop replans from)
    def edist(X):
        return np.linalg.norm(
            (X[:, 0:3] - np.array([3.0, 0.0, 2.0]))
            / (np.array([0.6, 1.6, 4.0]) / 2.0
               + cfg.static_safety_dist), axis=-1).min()
    d_s, d_n = edist(X_s), edist(X_n)
    assert d_s > d_n, (d_s, d_n)
    # replanning pushes the iterate progressively out of the ellipsoid
    # (the linearization point is the previous solution,
    # mpcPlanner.cpp:1042-1051, so each cycle's constraint rows steepen
    # as the plan leaves the interior — one cycle alone moves little)
    st_k, d_k = out_s.state, d_s
    for _ in range(4):
        out_k = mpclib.make_plan_with_pred(cfg, st_k, pos0, vel0, ref,
                                           jnp.asarray(33), pred, visible,
                                           200, static_obs=wall)
        st_k = out_k.state
        d_k = edist(np.asarray(st_k.states_sol))
    # measured fixed point of this scenario: ~0.76 vs 0.51 unconstrained
    # (the plan brakes at x~2.4 before the wall face)
    assert d_k > d_n + 0.2, (d_k, d_n)


def test_engine_static_clustering_brakes_before_wall():
    """Engine wiring smoke: planner.static_clustering=True extracts the
    local cloud from the static map each cycle, clusters it, and the QP's
    static rows keep the flown path out of the wall (no occupied voxel is
    ever entered) while the same episode WITHOUT clustering drives in."""
    import jax
    from intent_mpc_tpu.engine import closed_loop as cle
    from intent_mpc_tpu.models.occupancy import is_occupied
    from intent_mpc_tpu.models.world import Scenario

    g = _wall_grid()
    base = small_config(num_obstacles=1, horizon=10, timeout=4.0,
                        max_obstacles=1, hist=8)
    base = base.replace(goal=(8.0, 0.0, 2.0),
                        engine=dataclasses.replace(base.engine,
                                                   replan_check=False))
    sc = Scenario(origin=jnp.asarray([[50.0, 50.0, 1.0]], jnp.float32),
                  scale=jnp.zeros((1, 3), jnp.float32),
                  offset=jnp.zeros(1, jnp.float32),
                  slower=jnp.zeros(1, jnp.float32),
                  bbox=jnp.full((1, 3), 0.5, jnp.float32),
                  is_static=jnp.ones(1, bool))
    ref = jnp.linspace(jnp.zeros(3), jnp.array([8.0, 0.0, 2.0]), 33)
    tl = jnp.asarray(33)

    def fly(cfg, iters):
        carry, path = cle.run_episode(cfg, sc, ref, tl, occ=g,
                                      solver_iters=iters, record_path=True)
        hits = np.asarray(jax.vmap(lambda p: is_occupied(g, p))(path))
        return carry, int(hits.sum())

    cfg_c = base.replace(planner=dataclasses.replace(
        base.planner, static_clustering=True))
    # 150 iterations: at 60 the compromise iterate still dives under the
    # wall through the inflation shell (the dual ramp on the tight 0.01
    # static slack needs the deeper budget in this one-shot scenario)
    _, hits_c = fly(cfg_c, 150)
    _, hits_n = fly(base, 150)
    assert hits_n > 0       # without static rows the wall is invisible
    assert hits_c == 0, hits_c

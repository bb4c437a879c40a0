"""Incremental DEP (models/dep.py) vs dep.cpp semantics: persistent
roadmap growth from frontiers, occupancy pruning, per-yaw information
gain, candidate selection, and findBestPath scoring."""

import numpy as np
import jax
import jax.numpy as jnp

from intent_mpc_tpu.models.dep import (DEPConfig, dep_init, dep_step,
                                       node_gains)

RES = 0.5
ORIGIN = (0.0, 0.0, 0.0)


def _half_explored_map(dims=(24, 16, 6)):
    """log-odds grid: x < half known-free, x >= half unobserved (0)."""
    lo = np.zeros(dims, np.float32)
    lo[: dims[0] // 2] = -2.0          # observed free
    return lo


def _cfg(**kw):
    base = dict(capacity=48, samples_per_step=12, dist_thresh=0.6,
                sensor_range=3.0, connect_radius=3.0, max_path_len=10,
                max_candidates=4, yaw_bins=16)
    base.update(kw)
    return DEPConfig(**base)


def test_roadmap_grows_toward_frontier_and_persists():
    cfg = _cfg()
    lo = jnp.asarray(_half_explored_map())
    start = jnp.array([1.0, 4.0, 1.5])
    st = dep_init(cfg, start)
    key = jax.random.PRNGKey(0)
    step = jax.jit(lambda s, k: dep_step(cfg, lo, ORIGIN, RES, s, start,
                                         jnp.asarray(0.0), k))
    n_prev = 1
    for i in range(4):
        st, plan = step(st, jax.random.fold_in(key, i))
        n = int(jnp.sum(st.valid))
        assert n >= n_prev          # persistent: nodes never silently vanish
        n_prev = n
    assert n_prev > 4, n_prev       # the roadmap actually grew
    # frontier samples cluster at the known/unknown boundary (x = 6.0 m);
    # free-space samples (the reference's local/global sampling loops)
    # populate the observed interior so the graph stays connected
    nodes = np.asarray(st.pos)[np.asarray(st.valid)]
    grown = nodes[~np.all(np.isclose(nodes, np.asarray(start)), axis=-1)]
    near_frontier = np.abs(grown[:, 0] - 6.0) < 1.5
    assert near_frontier.sum() >= 3, grown[:, 0]
    assert (~near_frontier).sum() >= 2, grown[:, 0]   # interior nodes too
    assert np.all(grown[:, 0] < 6.5), grown[:, 0]     # never in the unknown
    # node spacing respects distThresh (dep.cpp:541-545)
    d = np.linalg.norm(grown[:, None] - grown[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    # sampled within one step may pair closer; across steps the check held
    assert np.median(np.min(d, axis=-1)) >= 0.25


def test_prune_drops_nodes_in_new_occupancy():
    cfg = _cfg()
    lo = _half_explored_map()
    start = jnp.array([1.0, 4.0, 1.5])
    st = dep_init(cfg, start)
    st, _ = dep_step(cfg, jnp.asarray(lo), ORIGIN, RES, st, start,
                     jnp.asarray(0.0), jax.random.PRNGKey(1))
    n_before = int(jnp.sum(st.valid))
    # a wall of occupancy appears over the frontier band (dep pruneNodes)
    lo2 = lo.copy()
    lo2[10:14] = 3.0
    st2, _ = dep_step(cfg, jnp.asarray(lo2), ORIGIN, RES, st, start,
                      jnp.asarray(0.0), jax.random.PRNGKey(2))
    nodes_before = np.asarray(st.pos)[np.asarray(st.valid)]
    in_wall = (nodes_before[:, 0] >= 5.0) & (nodes_before[:, 0] < 7.0)
    if in_wall.any():
        assert int(jnp.sum(st2.valid)) < n_before + cfg.samples_per_step
        nodes_after = np.asarray(st2.pos)[np.asarray(st2.valid)]
        assert not np.any((nodes_after[:, 0] >= 5.0)
                          & (nodes_after[:, 0] < 7.0))


def test_yaw_gain_points_at_the_unknown():
    """calculateUnknown semantics: a node at the boundary has its best
    yaw bin facing the unknown half-space (+x here)."""
    cfg = _cfg()
    lo = jnp.asarray(_half_explored_map())
    nodes = jnp.array([[5.5, 4.0, 1.5]])
    gain, ygain = node_gains(cfg, lo, jnp.asarray(ORIGIN), RES, nodes,
                             jnp.asarray([True]))
    assert float(gain[0]) > 0
    B = cfg.yaw_bins
    best = int(jnp.argmax(ygain[0]))
    best_yaw = -np.pi + (best + 0.5) * 2 * np.pi / B
    assert abs(best_yaw) < 0.7, best_yaw     # facing +x (the unknown side)
    # a node deep in known-free space sees (almost) nothing
    gain2, _ = node_gains(cfg, lo, jnp.asarray(ORIGIN), RES,
                          jnp.array([[1.0, 4.0, 1.5]]), jnp.asarray([True]))
    assert float(gain2[0]) < float(gain[0]) * 0.35


def test_plan_routes_to_a_scoring_view():
    cfg = _cfg()
    lo = jnp.asarray(_half_explored_map())
    start = jnp.array([1.0, 4.0, 1.5])
    st = dep_init(cfg, start)
    plan = None
    for i in range(3):
        st, plan = dep_step(cfg, lo, ORIGIN, RES, st, start,
                            jnp.asarray(0.0), jax.random.PRNGKey(10 + i))
    assert bool(plan.success)
    assert float(plan.score) > 0
    # the chosen viewpoint looks at the unknown: gain positive, path
    # starts at (a node near) the drone and ends at the viewpoint
    assert float(plan.gain) > 0
    path = np.asarray(plan.path)
    n = int(plan.path_len)
    assert n >= 1
    np.testing.assert_allclose(path[n - 1], np.asarray(plan.viewpoint),
                               atol=1e-5)
    assert np.linalg.norm(path[0] - np.asarray(start)) < 3.0
    # best yaw faces the unknown (+x)
    assert abs(float(plan.best_yaw)) < 1.2


def test_exploration_completes_when_nothing_is_unknown():
    cfg = _cfg()
    lo = jnp.full((24, 16, 6), -2.0)     # fully observed free
    start = jnp.array([1.0, 4.0, 1.5])
    st = dep_init(cfg, start)
    st, plan = dep_step(cfg, lo, ORIGIN, RES, st, start, jnp.asarray(0.0),
                        jax.random.PRNGKey(3))
    # no frontier -> no growth beyond the seed; no positive-gain view
    assert int(jnp.sum(st.valid)) == 1
    assert not bool(plan.success)

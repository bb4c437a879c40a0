"""Clustering tests: DBSCAN labels, 2-means split, rotated bbox fitting."""

import numpy as np
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.models import clustering as cl


@pytest.fixture(scope="module")
def cfg():
    return cl.ClusteringConfig(eps=0.5, min_pts=5, max_clusters=4,
                               tree_level=2, resolution=0.2)


def _two_blobs(seed=0):
    rng = np.random.RandomState(seed)
    a = rng.uniform(-0.3, 0.3, (40, 3)) + np.array([0.0, 0.0, 1.0])
    b = rng.uniform(-0.3, 0.3, (40, 3)) + np.array([5.0, 0.0, 1.0])
    pts = np.concatenate([a, b])
    return jnp.asarray(pts)


def test_dbscan_separates_blobs(cfg):
    pts = _two_blobs()
    labels = np.asarray(cl.dbscan(pts, jnp.ones(80, bool), cfg.eps,
                                  cfg.min_pts))
    la = set(labels[:40])
    lb = set(labels[40:])
    assert len(la) == 1 and len(lb) == 1 and la != lb
    assert -1 not in la | lb


def test_dbscan_noise(cfg):
    pts = np.zeros((20, 3))
    pts[:10] = np.random.RandomState(0).uniform(-0.2, 0.2, (10, 3))
    pts[10:] = np.arange(10)[:, None] * np.array([3.0, 3.0, 0.0]) + 10.0
    labels = np.asarray(cl.dbscan(jnp.asarray(pts), jnp.ones(20, bool),
                                  0.5, 5))
    assert (labels[10:] == -1).all()      # isolated points are noise
    assert (labels[:10] >= 0).all()


def test_kmeans_split(cfg):
    pts = _two_blobs()
    w = jnp.ones(80)
    wa, wb = cl.kmeans_split(pts, w, 10)
    wa, wb = np.asarray(wa), np.asarray(wb)
    # each blob lands in one part
    assert wa[:40].sum() + wb[:40].sum() == 40
    assert min(wa[:40].sum(), wb[:40].sum()) == 0
    assert min(wa[40:].sum(), wb[40:].sum()) == 0


def test_orientation_recovers_rotated_box(cfg):
    rng = np.random.RandomState(1)
    # long thin box rotated 30 degrees
    raw = rng.uniform(-1, 1, (200, 3)) * np.array([2.0, 0.3, 0.2])
    ang = np.pi / 6
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    pts = raw @ R.T + np.array([1.0, 2.0, 1.0])
    c, dim, yaw, dens = cl.best_orientation(cfg, jnp.asarray(pts),
                                            jnp.ones(200))
    # recovered box should be much tighter than the AABB
    aabb = pts.max(0) - pts.min(0)
    assert float(dim[0]) * float(dim[1]) < aabb[0] * aabb[1] * 0.75
    np.testing.assert_allclose(np.asarray(c), [1.0, 2.0, 1.0], atol=0.3)


def test_full_pipeline(cfg):
    pts = _two_blobs()
    out = cl.cluster_obstacles(cfg, pts, jnp.ones(80, bool))
    act = np.asarray(out.active)
    assert act.sum() >= 2
    cents = np.asarray(out.centroid)[act]
    d0 = np.linalg.norm(cents - np.array([0, 0, 1.0]), axis=-1).min()
    d1 = np.linalg.norm(cents - np.array([5, 0, 1.0]), axis=-1).min()
    assert d0 < 0.5 and d1 < 0.5

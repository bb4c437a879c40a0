"""Mapping stack tests: log-odds integration, inflation, raycast, ESDF."""

import numpy as np
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.models import mapping
from intent_mpc_tpu.models.occupancy import is_occupied


@pytest.fixture(scope="module")
def cfg():
    return mapping.MappingConfig(resolution=0.2, robot_size=(0.4, 0.4, 0.2))


def test_integration_marks_hits_and_misses(cfg):
    m = mapping.init_map(origin=(0, 0, 0), size_m=(6, 4, 2), cfg=cfg)
    origin = jnp.array([0.5, 2.0, 1.0])
    # wall of points at x=4
    ys = jnp.linspace(0.5, 3.5, 30)
    pts = jnp.stack([jnp.full_like(ys, 4.0), ys, jnp.full_like(ys, 1.0)], -1)
    valid = jnp.ones(30, bool)
    for _ in range(4):  # several frames to accumulate log odds past p_occ
        m = mapping.integrate_cloud(cfg, m, origin, pts, valid)
    occ = np.asarray(mapping.occupancy(cfg, m))
    res = 0.2
    # hit voxel occupied
    assert occ[int(4.0 / res), int(2.0 / res), int(1.0 / res)] == 1
    # free space along the ray stays free
    assert occ[int(2.0 / res), int(2.0 / res), int(1.0 / res)] == 0
    # log-odds clamped within [l_min, l_max]
    lo = np.asarray(m.log_odds)
    assert lo.max() <= cfg.l_max + 1e-5 and lo.min() >= cfg.l_min - 1e-5


def test_inflation_expands_by_robot_size(cfg):
    occ = jnp.zeros((20, 20, 10), jnp.int8).at[10, 10, 5].set(1)
    inf = np.asarray(mapping.inflate(cfg, occ, 0.2))
    assert inf[10, 10, 5] == 1
    assert inf[9, 10, 5] == 1 and inf[11, 10, 5] == 1  # 0.4m size -> 1 voxel
    assert inf[7, 10, 5] == 0


def test_cast_ray_first_hit(cfg):
    m = mapping.init_map(origin=(0, 0, 0), size_m=(6, 4, 2), cfg=cfg)
    origin = jnp.array([0.5, 2.0, 1.0])
    pts = jnp.array([[4.0, 2.0, 1.0]])
    for _ in range(4):
        m = mapping.integrate_cloud(cfg, m, origin, pts, jnp.ones(1, bool))
    grid = mapping.to_occupancy_grid(cfg, m, inflated=False)
    hit, p = mapping.cast_ray(grid, origin, jnp.array([6.0, 2.0, 1.0]))
    assert bool(hit)
    assert abs(float(p[0]) - 4.0) < 0.25


def test_esdf_signed_distances():
    occ = jnp.zeros((16, 16, 8), jnp.int8)
    occ = occ.at[8, 8, 4].set(1)
    d = np.asarray(mapping.esdf(occ, resolution=0.5))
    assert d[8, 8, 4] <= 0.0
    # voxel 3 to the right: distance 3 voxels * 0.5 = 1.5
    np.testing.assert_allclose(d[11, 8, 4], 1.5, atol=1e-5)
    np.testing.assert_allclose(d[8, 12, 4], 2.0, atol=1e-5)
    # diagonal voxel: sqrt(2)*0.5
    np.testing.assert_allclose(d[9, 9, 4], np.sqrt(2) * 0.5, atol=1e-5)


def test_free_regions_clears_boxes():
    occ = jnp.ones((10, 10, 4), jnp.int8)
    lowers = jnp.asarray([[0.4, 0.4, 0.0]])
    uppers = jnp.asarray([[1.2, 1.2, 2.0]])
    out = np.asarray(mapping.free_regions(occ, (0, 0, 0), 0.2, lowers, uppers))
    assert out[3, 3, 2] == 0      # inside box (0.7, 0.7, 0.5)
    assert out[8, 8, 2] == 1      # outside


def test_save_load_roundtrip(tmp_path, cfg):
    m = mapping.init_map(origin=(0, 0, 0), size_m=(2, 2, 1), cfg=cfg)
    m = m._replace(log_odds=m.log_odds.at[1, 2, 3].set(1.5))
    p = str(tmp_path / "map.npz")
    mapping.save_map(p, m)
    m2 = mapping.load_map(p)
    np.testing.assert_allclose(np.asarray(m2.log_odds),
                               np.asarray(m.log_odds))
    np.testing.assert_allclose(float(m2.resolution), 0.2)


def test_pcd_roundtrip_and_prebuilt_map(tmp_path):
    """PCD save/load round trip + initPrebuiltMap semantics: point voxels
    become max-log-odds occupied, inflation covers the robot box
    (occupancyMap.cpp:399-475)."""
    import numpy as np
    from intent_mpc_tpu.models.mapping import (
        MappingConfig, init_map, load_pcd, occupancy,
        prebuilt_map_from_points, save_pcd, to_occupancy_grid)
    from intent_mpc_tpu.models.occupancy import is_occupied

    pts = np.array([[1.0, 1.0, 1.0], [2.5, 0.5, 1.5], [9.9, 9.9, 9.9]],
                   np.float32)  # last point is outside the map
    p = tmp_path / "prebuilt.pcd"
    save_pcd(str(p), pts)
    loaded = load_pcd(str(p))
    np.testing.assert_allclose(loaded, pts, atol=1e-6)

    cfg = MappingConfig(resolution=0.25)
    m = init_map((0.0, 0.0, 0.0), (4.0, 4.0, 2.0), cfg)
    m = prebuilt_map_from_points(cfg, m, loaded)
    occ = np.asarray(occupancy(cfg, m))
    assert occ[4, 4, 4] == 1           # voxel of (1,1,1)
    assert occ[10, 2, 6] == 1          # voxel of (2.5,0.5,1.5)
    assert occ.sum() == 2              # out-of-map point dropped
    g = to_occupancy_grid(cfg, m, inflated=True)
    assert bool(is_occupied(g, jnp.array([1.2, 1.0, 1.0])))  # inflated
    assert not bool(is_occupied(g, jnp.array([3.5, 3.5, 0.5])))

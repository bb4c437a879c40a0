"""Depth-sensor model (models/sensor.py): pinhole AABB/grid rendering
feeding the real perception pipeline and the log-odds mapper — the
synthesized replacement for the Gazebo camera/lidar plugins."""

import jax.numpy as jnp
import numpy as np

from intent_mpc_tpu.models import perception as pc
from intent_mpc_tpu.models import sensor
from intent_mpc_tpu.models.clustering import dbscan

INTR = pc.CameraIntrinsics(fx=80.0, fy=80.0, cx=48.0, cy=32.0,
                           depth_min=0.3, depth_max=8.0, skip=2)
IMH, IMW = 64, 96


def test_camera_rotation_orthonormal():
    R = np.asarray(sensor.yaw_camera_rotation(jnp.asarray(0.7)))
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    assert np.isclose(np.linalg.det(R), 1.0, atol=1e-6)  # right-handed
    # optical forward maps to the heading
    np.testing.assert_allclose(R @ np.array([0.0, 0.0, 1.0]),
                               [np.cos(0.7), np.sin(0.7), 0.0], atol=1e-6)


def test_render_project_roundtrip():
    """Render one box, unproject the image: every valid point lies on the
    box's camera-facing front face."""
    cam = jnp.array([0.0, 0.0, 2.0])
    R = sensor.yaw_camera_rotation(jnp.asarray(0.0))  # facing +x
    centers = jnp.array([[4.0, 0.0, 2.0]])
    sizes = jnp.array([[1.0, 1.6, 1.6]])
    depth = sensor.render_depth(INTR, IMH, IMW, cam, R, centers, sizes,
                                jnp.array([True]))
    assert float(jnp.max(depth)) > 0.0  # something rendered
    pts, valid = pc.project_depth(INTR, depth, cam, R)
    pts = np.asarray(pts)[np.asarray(valid)]
    assert pts.shape[0] > 50
    # front face at x = 3.5; inside the face extent in y/z
    np.testing.assert_allclose(pts[:, 0], 3.5, atol=1e-2)
    assert np.all(np.abs(pts[:, 1]) <= 0.81)
    assert np.all(np.abs(pts[:, 2] - 2.0) <= 0.81)


def test_nearest_box_wins_and_misses_are_zero():
    cam = jnp.array([0.0, 0.0, 2.0])
    R = sensor.yaw_camera_rotation(jnp.asarray(0.0))
    centers = jnp.array([[4.0, 0.0, 2.0], [2.5, 0.0, 2.0]])
    sizes = jnp.array([[1.0, 1.0, 1.0], [0.6, 0.6, 0.6]])
    depth = sensor.render_depth(INTR, IMH, IMW, cam, R, centers, sizes,
                                jnp.array([True, True]))
    center_px = float(depth[32, 48]) / INTR.depth_scale
    # the closer box (front face at 2.2) occludes the far one (3.5)
    assert abs(center_px - 2.2) < 1e-2
    # sky pixels return 0 (sensor dropout convention)
    assert float(depth[0, 0]) == 0.0
    # inactive boxes vanish
    depth2 = sensor.render_depth(INTR, IMH, IMW, cam, R, centers, sizes,
                                 jnp.array([True, False]))
    assert abs(float(depth2[32, 48]) / INTR.depth_scale - 3.5) < 1e-2


def test_sensor_to_perception_pipeline():
    """Rendered frame -> U-map detector + DBSCAN on unprojected points:
    the real detector stack sees the two synthesized obstacles."""
    cam = jnp.array([0.0, 0.0, 2.0])
    R = sensor.yaw_camera_rotation(jnp.asarray(0.0))
    centers = jnp.array([[4.0, -1.2, 2.0], [4.0, 1.2, 2.0]])
    sizes = jnp.array([[0.8, 0.8, 0.8], [0.8, 0.8, 0.8]])
    depth = sensor.render_depth(INTR, IMH, IMW, cam, R, centers, sizes,
                                jnp.array([True, True]))
    boxes, valid = pc.u_map_detect(INTR, depth, num_bins=24, min_hits=12,
                                   max_boxes=8)
    got = np.asarray(boxes)[np.asarray(valid)]
    assert got.shape[0] >= 2
    # detected band depths near the 3.6 m front faces
    assert np.all(np.abs(got[:2, 2] - 3.6) < 0.5)

    pts, pvalid = pc.project_depth(INTR, depth, cam, R)
    labels = np.asarray(dbscan(pts, pvalid, eps=0.5, min_pts=8))
    n_clusters = len({int(l) for l in labels if l >= 0})
    assert n_clusters == 2  # two spatial clusters


def test_grid_render_matches_box_render():
    """Ray-marched occupancy-grid rendering agrees with the analytic AABB
    renderer on the shared scene (within one sample step)."""
    from intent_mpc_tpu.models.occupancy import build_from_static_obstacles
    cam = jnp.array([0.0, 0.0, 1.0])
    R = sensor.yaw_camera_rotation(jnp.asarray(0.0))
    centers = [[3.0, 0.0, 1.0]]
    sizes = [[1.0, 1.2, 1.2]]
    g = build_from_static_obstacles((-1.0, -4.0, 0.0), (9.0, 8.0, 3.0), 0.1,
                                    centers, sizes, (0.0, 0.0, 0.0))
    d_box = sensor.render_depth(INTR, IMH, IMW, cam, R,
                                jnp.asarray(centers), jnp.asarray(sizes),
                                jnp.array([True]))
    d_grid = sensor.render_depth_grid(INTR, IMH, IMW, cam, R, g,
                                      max_depth=8.0, samples=256)
    cb = float(d_box[32, 48]) / INTR.depth_scale
    cg = float(d_grid[32, 48]) / INTR.depth_scale
    assert abs(cb - cg) < 0.15  # voxelization + march-step tolerance


def test_sensor_to_map_roundtrip():
    """Rendered frame -> point cloud -> log-odds map: voxels on the box
    front face become occupied, the free space between stays free
    (projectDepthImage -> raycastUpdate parity loop)."""
    from intent_mpc_tpu.models.mapping import (MappingConfig, init_map,
                                               integrate_cloud, occupancy)
    cam = jnp.array([1.0, 3.0, 1.5])
    R = sensor.yaw_camera_rotation(jnp.asarray(0.0))
    centers = jnp.array([[4.0, 3.0, 1.5]])
    sizes = jnp.array([[0.8, 1.4, 1.4]])
    depth = sensor.render_depth(INTR, IMH, IMW, cam, R, centers, sizes,
                                jnp.array([True]))
    pts, valid = pc.project_depth(INTR, depth, cam, R)

    mcfg = MappingConfig(resolution=0.2)
    m = init_map((0.0, 0.0, 0.0), (8.0, 6.0, 3.0), mcfg)
    for _ in range(3):  # a few frames push log-odds past the threshold
        m = integrate_cloud(mcfg, m, cam, pts, valid)
    occ = np.asarray(occupancy(mcfg, m))
    res = 0.2
    front = occ[int(3.6 / res), int(3.0 / res), int(1.5 / res)]
    free_between = occ[int(2.0 / res), int(3.0 / res), int(1.5 / res)]
    assert front == 1
    assert free_between == 0

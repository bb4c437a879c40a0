"""Depth-camera sensor model: render the array world into depth images.

The reference's perception stack consumes real depth frames — the Gazebo
camera/livox plugins produce them (uav_simulator/src/livox_lidar/
livox_points_plugin.cpp) and map_manager::occMap projects them
(occupancyMap.cpp projectDepthImage) while onboard_detector clusters them
(dynamicDetector.cpp detectionCB). The array framework replaced the
renderer with ground-truth detections for the benchmark path; this module
closes the sensing loop: it renders the obstacle world (dynamic AABBs +
optional static voxel grid) into a pinhole depth image so the REAL
perception pipeline (models/perception.py: project_depth -> DBSCAN/U-map
-> KF tracking) and the log-odds mapper (models/mapping.integrate_cloud)
run end-to-end on synthesized sensor data.

TPU-native design: one ray per pixel, all boxes tested with the
branch-free slab method as a (pixels x boxes) broadcast — a single
fused elementwise reduction, no BVH (obstacle counts are <=200). Depth
follows the camera-optical z-depth convention that project_depth
inverts: pixel ray direction ((u-cx)/fx, (v-cy)/fy, 1) in the optical
frame (x right, y down, z forward), stored value = z * depth_scale,
0 where nothing is hit (invalid, like a real sensor's dropout).
"""

from __future__ import annotations

import jax.numpy as jnp

from intent_mpc_tpu.models.occupancy import OccupancyGrid, is_occupied
from intent_mpc_tpu.models.perception import CameraIntrinsics


def yaw_camera_rotation(yaw) -> jnp.ndarray:
    """Camera-optical-frame -> world rotation for a level camera facing
    along world yaw: optical z (forward) -> (cos yaw, sin yaw, 0),
    optical x (image right) -> (sin yaw, -cos yaw... ) chosen so optical
    y (image down) maps to world -z (image up = world up)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    x_w = jnp.stack([s, -c, zero])   # image right = right of heading
    y_w = jnp.stack([zero, zero, -one])  # image down = world down
    z_w = jnp.stack([c, s, zero])    # optical forward = heading
    return jnp.stack([x_w, y_w, z_w], axis=-1)


def render_depth(intr: CameraIntrinsics, im_h: int, im_w: int,
                 cam_pos: jnp.ndarray, cam_rot: jnp.ndarray,
                 centers: jnp.ndarray, sizes: jnp.ndarray,
                 active: jnp.ndarray,
                 max_depth: float = 20.0) -> jnp.ndarray:
    """Render AABBs into an (im_h, im_w) raw depth image.

    centers/sizes (O, 3) world AABBs, active (O,) mask. cam_rot (3, 3)
    optical->world. Returns raw depth (z * depth_scale), 0 = no return.
    """
    vv, uu = jnp.meshgrid(jnp.arange(im_h), jnp.arange(im_w), indexing="ij")
    dirs_cam = jnp.stack([(uu - intr.cx) / intr.fx,
                          (vv - intr.cy) / intr.fy,
                          jnp.ones_like(uu, jnp.float32)], axis=-1)
    dirs = dirs_cam.reshape(-1, 3) @ cam_rot.T                    # (P,3)
    o = cam_pos[None, None, :]                                    # (1,1,3)

    lo = (centers - sizes / 2.0)[None, :, :]                      # (1,O,3)
    hi = (centers + sizes / 2.0)[None, :, :]
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-9,
                          jnp.where(dirs >= 0, 1e-9, -1e-9), dirs)
    inv = inv[:, None, :]                                         # (P,1,3)
    t1 = (lo - o) * inv
    t2 = (hi - o) * inv
    t_enter = jnp.max(jnp.minimum(t1, t2), axis=-1)               # (P,O)
    t_exit = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (t_enter <= t_exit) & (t_exit > 0.0) & active[None, :]
    # camera inside a box sees its interior at t=0+ (clamp like a sensor
    # minimum range miss): treat as no return
    hit = hit & (t_enter > 1e-6)
    t = jnp.where(hit, t_enter, jnp.inf)
    z = jnp.min(t, axis=-1)                                       # (P,)
    z = jnp.where(jnp.isfinite(z) & (z <= max_depth), z, 0.0)
    return (z.reshape(im_h, im_w) * intr.depth_scale).astype(jnp.float32)


def render_depth_grid(intr: CameraIntrinsics, im_h: int, im_w: int,
                      cam_pos: jnp.ndarray, cam_rot: jnp.ndarray,
                      occ: OccupancyGrid, max_depth: float = 10.0,
                      samples: int = 128) -> jnp.ndarray:
    """Render a static occupancy grid by per-pixel ray marching (first
    occupied sample — the inverse of occupancyMap's projectDepthImage +
    raycastUpdate round trip). For tests and map-driven scenes; cost is
    pixels x samples gathers."""
    vv, uu = jnp.meshgrid(jnp.arange(im_h), jnp.arange(im_w), indexing="ij")
    dirs_cam = jnp.stack([(uu - intr.cx) / intr.fx,
                          (vv - intr.cy) / intr.fy,
                          jnp.ones_like(uu, jnp.float32)], axis=-1)
    dirs = dirs_cam.reshape(-1, 3) @ cam_rot.T                    # (P,3)
    ts = (jnp.arange(samples) + 0.5) / samples * max_depth        # (S,)
    pts = cam_pos[None, None, :] + dirs[:, None, :] * ts[None, :, None]
    occ_hit = is_occupied(occ, pts)                               # (P,S)
    any_hit = jnp.any(occ_hit, axis=-1)
    first = jnp.argmax(occ_hit, axis=-1)
    z = jnp.where(any_hit, ts[first], 0.0)
    return (z.reshape(im_h, im_w) * intr.depth_scale).astype(jnp.float32)

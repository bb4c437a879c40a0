"""Voxel occupancy grid as a device array.

The reference's map_manager::occMap is a log-odds voxel map fed by depth
images (map_manager/occupancyMap.cpp). In the DYNUS benchmark path no depth
sensor runs, so the map stays empty and `isInflatedOccupied` is always
false — the predictor's rejection sampling and the planner's static
collision checks become no-ops (mapping_param.yaml disables the camera in
headless DYNUS runs).

We keep the same query surface as a gather into a dense int8 grid, which
is what the predictor rollouts and collision checks consume. A static grid
can be rasterized from static obstacles (build_from_static_obstacles) for
map-driven scenarios. The full log-odds raycasting pipeline is a separate
component (see intent_mpc_tpu/models/mapping.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class OccupancyGrid(NamedTuple):
    grid: jnp.ndarray        # (nx, ny, nz) int8; 1 = inflated-occupied
    origin: jnp.ndarray      # (3,) world position of voxel (0,0,0) corner
    resolution: jnp.ndarray  # scalar


def empty_grid() -> OccupancyGrid:
    """A grid that reports free everywhere (the DYNUS benchmark map state)."""
    return OccupancyGrid(
        grid=jnp.zeros((1, 1, 1), jnp.int8),
        origin=jnp.array([1e9, 1e9, 1e9], jnp.float32),
        resolution=jnp.asarray(1.0, jnp.float32),
    )


def is_occupied(g: OccupancyGrid, p: jnp.ndarray) -> jnp.ndarray:
    """Vectorized isInflatedOccupied: p (..., 3) -> bool (...).

    Out-of-map points are free (occupancyMap isInMap semantics)."""
    idx = jnp.floor((p - g.origin) / g.resolution).astype(jnp.int32)
    shape = jnp.array(g.grid.shape)
    in_map = jnp.all((idx >= 0) & (idx < shape), axis=-1)
    idx_c = jnp.clip(idx, 0, shape - 1)
    vals = g.grid[idx_c[..., 0], idx_c[..., 1], idx_c[..., 2]]
    return in_map & (vals > 0)


def local_occupied_points(g: OccupancyGrid, center: jnp.ndarray,
                          window: tuple, max_points: int):
    """Fixed-shape local static cloud: the `max_points` occupied voxel
    centers nearest `center` within a `window`-voxel box around it.

    The reference feeds obstacleClustering a local static point cloud
    gathered from the map around the robot (mpcPlanner.cpp getStaticObs
    path; obstacleClustering.cpp:14-95 consumes a pcl cloud). Here the
    cloud is a dynamic_slice window of the inflated grid with a top-k
    nearest-occupied selection so the shape stays static for XLA.
    Returns (pts (max_points, 3), valid (max_points,) bool)."""
    import jax
    nx, ny, nz = window
    res = g.resolution
    shape = jnp.array(g.grid.shape)
    idx0 = jnp.floor((center - g.origin) / res).astype(jnp.int32) \
        - jnp.array([nx // 2, ny // 2, nz // 2])
    idx0 = jnp.clip(idx0, 0, jnp.maximum(shape - jnp.array([nx, ny, nz]), 0))
    win = jax.lax.dynamic_slice(
        g.grid, (idx0[0], idx0[1], idx0[2]),
        (min(nx, g.grid.shape[0]), min(ny, g.grid.shape[1]),
         min(nz, g.grid.shape[2])))
    ii, jj, kk = jnp.meshgrid(jnp.arange(win.shape[0]),
                              jnp.arange(win.shape[1]),
                              jnp.arange(win.shape[2]), indexing="ij")
    coords = (jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
              + idx0[None, :] + 0.5) * res + g.origin[None, :]
    occm = win.reshape(-1) > 0
    d2 = jnp.sum((coords - center[None, :]) ** 2, axis=-1)
    score = jnp.where(occm, -d2, -jnp.inf)
    k = min(max_points, coords.shape[0])
    top, sel = jax.lax.top_k(score, k)
    pts = coords[sel]
    valid = jnp.isfinite(top)
    if k < max_points:
        pts = jnp.pad(pts, ((0, max_points - k), (0, 0)))
        valid = jnp.pad(valid, (0, max_points - k))
    return jnp.where(valid[:, None], pts, 0.0), valid


def build_from_static_obstacles(origin, size_m, resolution,
                                centers, bboxes, inflation) -> OccupancyGrid:
    """Rasterize axis-aligned static boxes (inflated by robot size) into a
    grid — host-side helper for map-driven scenarios."""
    origin = np.asarray(origin, np.float32)
    dims = tuple(int(np.ceil(s / resolution)) for s in size_m)
    grid = np.zeros(dims, np.int8)
    centers = np.asarray(centers)
    bboxes = np.asarray(bboxes)
    inflation = np.asarray(inflation)
    for c, b in zip(centers, bboxes):
        half = b / 2.0 + inflation
        lo = np.floor((c - half - origin) / resolution).astype(int)
        hi = np.ceil((c + half - origin) / resolution).astype(int)
        lo = np.clip(lo, 0, np.array(dims) - 1)
        hi = np.clip(hi, 0, np.array(dims))
        grid[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = 1
    return OccupancyGrid(grid=jnp.asarray(grid),
                         origin=jnp.asarray(origin),
                         resolution=jnp.asarray(resolution, jnp.float32))

"""Occupancy mapping: log-odds voxel map, inflation, raycast, ESDF.

TPU-native rebuild of map_manager (map_manager/include/map_manager/):

  * occupancyMap.cpp: log-odds grid fed by sensor point clouds. The
    reference walks each ray with Amanatides-Woo traversal and a per-frame
    hit/miss cache so every voxel updates at most once per frame
    (raycastUpdate :810-977). Here rays are sampled at sub-voxel fixed
    steps and deduplicated with scatter-max visit masks — same
    once-per-frame semantics, fully vectorized over rays x steps.
  * inflateLocalMap (:1030+): robot-size box inflation == max-pool over the
    occupancy grid (lax.reduce_window).
  * raycast.cpp (Amanatides-Woo): castRay == first-hit search along fixed
    sub-voxel samples.
  * ESDFMap.cpp (:69-120): 3-pass separable distance transform ->
    vectorized per-axis min-plus squared-distance transform (exact, the
    Felzenszwalb envelope replaced by a broadcasted O(n^2) reduction that
    maps onto the VPU), positive + negative fields.

Config values mirror mapping_param.yaml (p_hit .70, p_miss .35, p_min .12,
p_max .97, p_occ .80, raycast_max_length 5.0).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from intent_mpc_tpu.models.occupancy import OccupancyGrid


class MappingConfig(NamedTuple):
    resolution: float = 0.15
    p_hit: float = 0.70
    p_miss: float = 0.35
    p_min: float = 0.12
    p_max: float = 0.97
    p_occ: float = 0.80
    raycast_max_len: float = 5.0
    robot_size: Tuple[float, float, float] = (0.5, 0.5, 0.3)

    @property
    def l_hit(self) -> float:
        return math.log(self.p_hit / (1 - self.p_hit))

    @property
    def l_miss(self) -> float:
        return math.log(self.p_miss / (1 - self.p_miss))

    @property
    def l_min(self) -> float:
        return math.log(self.p_min / (1 - self.p_min))

    @property
    def l_max(self) -> float:
        return math.log(self.p_max / (1 - self.p_max))

    @property
    def l_occ(self) -> float:
        return math.log(self.p_occ / (1 - self.p_occ))


class LogOddsMap(NamedTuple):
    log_odds: jnp.ndarray    # (nx, ny, nz) float32
    origin: jnp.ndarray      # (3,)
    resolution: jnp.ndarray  # scalar


def init_map(origin, size_m, cfg: MappingConfig) -> LogOddsMap:
    dims = tuple(int(math.ceil(s / cfg.resolution)) for s in size_m)
    return LogOddsMap(
        log_odds=jnp.zeros(dims, jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        resolution=jnp.asarray(cfg.resolution, jnp.float32))


def _flat_idx(m: LogOddsMap, idx):
    d = m.log_odds.shape
    return (idx[..., 0] * d[1] + idx[..., 1]) * d[2] + idx[..., 2]


def integrate_cloud(cfg: MappingConfig, m: LogOddsMap, sensor_origin,
                    points, point_valid, samples_per_ray: int = 64
                    ) -> LogOddsMap:
    """One sensor frame: free-space misses along each ray, hit at endpoints.

    points (P,3) world-frame; point_valid (P,) mask. Points beyond
    raycast_max_len are clamped and treated as miss-only (occupancyMap.cpp
    raycastUpdate range handling). Per-frame once-per-voxel semantics via
    visit masks.
    """
    res = m.resolution
    d = m.log_odds.shape
    nflat = d[0] * d[1] * d[2]
    o = jnp.asarray(sensor_origin)

    vec = points - o[None, :]
    dist = jnp.linalg.norm(vec, axis=-1)
    in_range = dist <= cfg.raycast_max_len
    clamp = jnp.minimum(dist, cfg.raycast_max_len)
    direction = vec / jnp.maximum(dist, 1e-9)[:, None]
    end = o[None, :] + direction * clamp[:, None]

    # sub-voxel sampling along each ray (excluding the endpoint voxel)
    fr = (jnp.arange(samples_per_ray) + 0.5) / samples_per_ray
    pts = o[None, None, :] + (end - o[None, :])[:, None, :] * fr[None, :, None]
    idx = jnp.floor((pts - m.origin) / res).astype(jnp.int32)
    dims = jnp.array(d)
    inside = jnp.all((idx >= 0) & (idx < dims), axis=-1)

    hit_idx = jnp.floor((end - m.origin) / res).astype(jnp.int32)
    hit_inside = jnp.all((hit_idx >= 0) & (hit_idx < dims), axis=-1)
    hit_valid = point_valid & in_range & hit_inside
    hit_flat = jnp.where(hit_valid, _flat_idx(m, hit_idx), nflat)

    is_hit_voxel = jnp.all(idx == hit_idx[:, None, :], axis=-1)
    miss_valid = point_valid[:, None] & inside & ~(is_hit_voxel & in_range[:, None])
    miss_flat = jnp.where(miss_valid, _flat_idx(m, idx), nflat)

    visit_miss = jnp.zeros(nflat + 1, jnp.float32) \
        .at[miss_flat.reshape(-1)].max(1.0)
    visit_hit = jnp.zeros(nflat + 1, jnp.float32) \
        .at[hit_flat].max(1.0)
    # a voxel hit by any ray is a hit, not a miss (reference hit priority)
    visit_miss = visit_miss * (1.0 - visit_hit)

    delta = (visit_hit[:nflat] * cfg.l_hit
             + visit_miss[:nflat] * cfg.l_miss).reshape(d)
    lo = jnp.clip(m.log_odds + delta, cfg.l_min, cfg.l_max)
    return m._replace(log_odds=lo)


def occupancy(cfg: MappingConfig, m: LogOddsMap) -> jnp.ndarray:
    """Binary occupancy: log-odds >= l_occ (isOccupied semantics)."""
    return (m.log_odds >= cfg.l_occ).astype(jnp.int8)


def inflate(cfg: MappingConfig, occ: jnp.ndarray,
            resolution: float) -> jnp.ndarray:
    """Robot-size box inflation == max-pool (inflateLocalMap)."""
    ks = tuple(2 * int(math.ceil(s / 2.0 / resolution)) + 1
               for s in cfg.robot_size)
    return jax.lax.reduce_window(
        occ.astype(jnp.float32), -jnp.inf, jax.lax.max,
        window_dimensions=ks, window_strides=(1, 1, 1),
        padding="SAME").astype(jnp.int8)


def to_occupancy_grid(cfg: MappingConfig, m: LogOddsMap,
                      inflated: bool = True) -> OccupancyGrid:
    occ = occupancy(cfg, m)
    if inflated:
        occ = inflate(cfg, occ, float(m.resolution))
    return OccupancyGrid(grid=occ, origin=m.origin, resolution=m.resolution)


def cast_ray(grid: OccupancyGrid, start, end, samples: int = 256):
    """castRay (occupancyMap + raycast.cpp): first occupied sample between
    start and end. Returns (hit (bool), hit_point (3,))."""
    fr = jnp.linspace(0.0, 1.0, samples)
    pts = start[None, :] + (end - start)[None, :] * fr[:, None]
    from intent_mpc_tpu.models.occupancy import is_occupied
    occ = is_occupied(grid, pts)
    any_hit = jnp.any(occ)
    first = jnp.argmax(occ)
    return any_hit, jnp.where(any_hit, pts[first], end)


def free_regions(occ: jnp.ndarray, origin, resolution,
                 lowers, uppers) -> jnp.ndarray:
    """Clear axis-aligned boxes in an occupancy grid — dynamicMap::freeRegions
    (map_manager/dynamicMap.cpp:23-66): voxels around detected dynamic
    obstacles are forced free so moving obstacles don't smear into the
    static map. lowers/uppers (R, 3) world-space box corners."""
    origin = jnp.asarray(origin)
    dims = occ.shape
    ii = jnp.arange(dims[0])[:, None, None]
    jj = jnp.arange(dims[1])[None, :, None]
    kk = jnp.arange(dims[2])[None, None, :]
    centers = jnp.stack(jnp.broadcast_arrays(
        origin[0] + (ii + 0.5) * resolution,
        origin[1] + (jj + 0.5) * resolution,
        origin[2] + (kk + 0.5) * resolution), axis=-1)
    inside = jnp.zeros(dims, bool)
    for r in range(lowers.shape[0]):
        inb = jnp.all((centers >= lowers[r]) & (centers <= uppers[r]),
                      axis=-1)
        inside = inside | inb
    return jnp.where(inside, 0, occ).astype(occ.dtype)


def save_map(path: str, m: LogOddsMap) -> None:
    """Persist a map (save_map_node / prebuilt_map_directory equivalent —
    npz instead of .pcd)."""
    import numpy as np
    np.savez_compressed(path, log_odds=np.asarray(m.log_odds),
                        origin=np.asarray(m.origin),
                        resolution=np.asarray(m.resolution))


def load_map(path: str) -> LogOddsMap:
    import numpy as np
    d = np.load(path)
    return LogOddsMap(log_odds=jnp.asarray(d["log_odds"]),
                      origin=jnp.asarray(d["origin"]),
                      resolution=jnp.asarray(d["resolution"]))


def _sq_dist_transform_1d(f: jnp.ndarray, chunk: int = 64) -> jnp.ndarray:
    """Exact 1-D squared distance transform along the last axis:
    out[i] = min_j f[j] + (i-j)^2 (voxel units). Broadcasted min-plus."""
    n = f.shape[-1]
    j = jnp.arange(n)
    outs = []
    for c0 in range(0, n, chunk):
        i = jnp.arange(c0, min(c0 + chunk, n))
        cost = f[..., None, :] + (i[:, None] - j[None, :]) ** 2
        outs.append(jnp.min(cost, axis=-1))
    return jnp.concatenate(outs, axis=-1)


def esdf(occ: jnp.ndarray, resolution: float) -> jnp.ndarray:
    """Signed Euclidean distance field (meters): positive outside obstacles,
    negative inside (ESDFMap::updateESDF3D pos+neg passes)."""
    big = jnp.asarray(1e9, jnp.float32)

    def edt(grid_bool):
        f = jnp.where(grid_bool, 0.0, big)
        for ax in range(3):
            f = jnp.moveaxis(f, ax, -1)
            f = _sq_dist_transform_1d(f)
            f = jnp.moveaxis(f, -1, ax)
        return jnp.sqrt(f) * resolution

    occ_b = occ > 0
    pos = edt(occ_b)
    neg = edt(~occ_b)
    return jnp.where(occ_b, -neg, pos)


def load_pcd(path: str):
    """Load an x/y/z point cloud from a .pcd file (the reference's
    prebuilt-map format, occupancyMap.cpp initPrebuiltMap :399-475 via
    pcl::io::loadPCDFile). Supports ASCII and binary little-endian PCD
    v0.7 with float32 x/y/z leading fields. Returns (P, 3) numpy."""
    import numpy as np
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            if not line or line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key.upper()] = val
            if key.upper() == "DATA":
                break
        fields = header.get("FIELDS", "x y z").split()
        sizes = [int(s) for s in header.get(
            "SIZE", " ".join(["4"] * len(fields))).split()]
        counts = [int(c) for c in header.get(
            "COUNT", " ".join(["1"] * len(fields))).split()]
        n = int(header.get("POINTS", header.get("WIDTH", "0")))
        mode = header["DATA"].split()[0]
        stride = sum(s * c for s, c in zip(sizes, counts))
        offs = {}
        off = 0
        for name, s, c in zip(fields, sizes, counts):
            offs[name] = off
            off += s * c
        if not all(k in offs for k in ("x", "y", "z")):
            raise ValueError(f"pcd missing x/y/z fields: {fields}")
        if mode == "ascii":
            rows = np.loadtxt(f, dtype=np.float64, max_rows=n, ndmin=2)
            ix = [fields.index(k) for k in ("x", "y", "z")]
            return np.ascontiguousarray(rows[:, ix], np.float32)
        if mode == "binary":
            raw = np.frombuffer(f.read(n * stride), np.uint8,
                                count=n * stride).reshape(n, stride)
            out = np.zeros((n, 3), np.float32)
            for j, k in enumerate(("x", "y", "z")):
                out[:, j] = raw[:, offs[k]:offs[k] + 4].copy().view("<f4")[:, 0]
            return out
        raise ValueError(f"unsupported pcd DATA mode: {mode}")


def save_pcd(path: str, points) -> None:
    """Write an ASCII x/y/z .pcd (round-trip partner of load_pcd)."""
    import numpy as np
    pts = np.asarray(points, np.float32)
    with open(path, "w") as f:
        f.write("# .PCD v0.7 - Point Cloud Data file format\n"
                "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                "COUNT 1 1 1\n"
                f"WIDTH {len(pts)}\nHEIGHT 1\n"
                "VIEWPOINT 0 0 0 1 0 0 0\n"
                f"POINTS {len(pts)}\nDATA ascii\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


def prebuilt_map_from_points(cfg: MappingConfig, m: LogOddsMap,
                             points) -> LogOddsMap:
    """initPrebuiltMap semantics: each cloud point's voxel is set to the
    max log-odds (occupancyMap.cpp:428); robot-size inflation then comes
    from the standard `inflate`/`to_occupancy_grid` path (the reference
    inflates by ceil(robot/2 / res) boxes, which `inflate` reproduces)."""
    import numpy as np
    pts = jnp.asarray(np.asarray(points, np.float32))
    idx = jnp.floor((pts - m.origin) / m.resolution).astype(jnp.int32)
    dims = jnp.array(m.log_odds.shape)
    inside = jnp.all((idx >= 0) & (idx < dims), axis=-1)
    idx = jnp.clip(idx, 0, dims - 1)
    lo = m.log_odds
    val = jnp.where(inside, cfg.l_max, -jnp.inf)  # outside: no-op via max
    lo = lo.at[idx[:, 0], idx[:, 1], idx[:, 2]].max(val)
    return m._replace(log_odds=lo)

"""Trajectory divider: braking-zone segmentation for the time optimizer.

Rebuild of time_optimizer/trajectoryDivider.cpp (379 LoC): given a
sampled trajectory with timestamps and the occupancy map, find the time
intervals where the trajectory passes close to obstacles IN the
direction of travel ("braking zones"), merge/filter them with the
reference's hysteresis rules, and report the minimum obstacle distance
per zone. bsplineTimeOptimizer.cpp:36-46 feeds these intervals to the
time optimizer, which lowers the velocity limit inside the zones before
solving the minimum-time parameterization.

TPU-first redesign:
  * the reference builds a KD-tree over occupied voxels in an inflated
    trajectory AABB and nearest-neighbor-queries every sample
    (buildKDTree/findNearestObstacles :140-193). Here the nearest
    occupied voxel within `safe_dist` comes from a fixed-shape local
    window scan over the occupancy grid per sample (vectorized gather;
    the window radius is ceil(safe_dist / resolution)). No trees, no
    ragged shapes.
  * interval extraction/merging (divideTrajectory :195-287) becomes a
    run-length encoding over the sample mask plus a lax.scan merge with
    the same thresholds (min(minTimeIntervalRatio * T, minTime) duration
    filter; merge when the gap to the previous kept zone is below
    min(minIntervalDiffRatio * T, minTimeDiff)).
  * per-zone obstacle distance: the reference's loop
    (:277-286) indexes `nearestObstacles[i]` by the INTERVAL counter —
    an evident index bug; we compute the intended minimum over the
    zone's SAMPLES. Recorded deviation.

The divider + per-sample velocity limits close VERDICT item 10's loop:
min-snap trajectory -> divider -> TOPP (models/time_optimizer.py, which
accepts per-sample velocity limits) -> sampled states respecting limits.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from intent_mpc_tpu.models.occupancy import OccupancyGrid


class DividerParams(NamedTuple):
    max_length: float = 20.0            # trajectoryDivider.h:39
    safe_dist: float = 1.0              # :40
    min_time_interval_ratio: float = 0.1  # :41
    min_time: float = 0.5               # :42
    min_interval_diff_ratio: float = 0.05  # :43
    min_time_diff: float = 0.25         # :44
    max_intervals: int = 8              # fixed-shape zone slots
    window_vox: int = 10                # window radius (>= safe_dist/res)
    close_gap_samples: int = 2          # fill sample-mask gaps up to this
                                        # many samples before run
                                        # extraction (the mask flickers at
                                        # the safe-dist / angle boundaries
                                        # between discrete samples; the
                                        # reference's gap-merge rule plays
                                        # the same smoothing role)


class DividerResult(NamedTuple):
    in_zone: jnp.ndarray        # (N,) bool: sample inside a kept zone
    t_lo: jnp.ndarray           # (I,) zone start times
    t_hi: jnp.ndarray           # (I,) zone end times
    zone_valid: jnp.ndarray     # (I,) bool
    obstacle_dist: jnp.ndarray  # (I,) min obstacle distance inside zone
    sample_dist: jnp.ndarray    # (N,) distance to nearest forward obstacle
                                # (inf where none within safe_dist)


def _nearest_in_window(occ: OccupancyGrid, p: jnp.ndarray, r: int):
    """Nearest occupied voxel center within the (2r+1)^3 window around p.
    Returns (dist, direction p_nn - p); dist = +inf if none occupied."""
    res = occ.resolution
    base = jnp.floor((p - occ.origin) / res).astype(jnp.int32)
    offs = jnp.arange(-r, r + 1)
    ox, oy, oz = jnp.meshgrid(offs, offs, offs, indexing="ij")
    idx = base[None, :] + jnp.stack(
        [ox.ravel(), oy.ravel(), oz.ravel()], axis=-1)      # (M, 3)
    dims = jnp.asarray(occ.grid.shape)
    inb = jnp.all((idx >= 0) & (idx < dims[None, :]), axis=-1)
    ic = jnp.clip(idx, 0, dims[None, :] - 1)
    hit = (occ.grid[ic[:, 0], ic[:, 1], ic[:, 2]] > 0) & inb
    centers = occ.origin[None, :] + (ic.astype(jnp.float32) + 0.5) * res
    d = jnp.linalg.norm(centers - p[None, :], axis=-1)
    d = jnp.where(hit, d, jnp.inf)
    k = jnp.argmin(d)
    return d[k], centers[k] - p


def divide(traj: jnp.ndarray, times: jnp.ndarray, occ: OccupancyGrid,
           params: DividerParams = DividerParams()) -> DividerResult:
    """Segment a sampled trajectory (N,3) with timestamps (N,) into
    braking zones near obstacles (trajDivider::run)."""
    N = traj.shape[0]
    I = params.max_intervals

    # ---- max-length cutoff (findRange :71-79) ----
    seg = jnp.linalg.norm(traj[1:] - traj[:-1], axis=-1)
    arclen = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])
    within = arclen <= params.max_length

    # ---- nearest forward obstacle per sample (findNearestObstacles) ----
    dist, direc = jax.vmap(
        lambda p: _nearest_in_window(occ, p, params.window_vox))(traj)
    vel_dir = jnp.concatenate([traj[1:] - traj[:-1], jnp.zeros((1, 3))],
                              axis=0)
    forward = jnp.sum(vel_dir * direc, axis=-1) >= 0.0      # angle <= pi/2
    last = jnp.arange(N) == N - 1
    mask = (dist <= params.safe_dist) & forward & within & ~last
    sample_dist = jnp.where(mask, dist, jnp.inf)

    # ---- close small gaps (binary closing along time) ----
    g = params.close_gap_samples
    if g > 0:
        left = mask
        right = mask
        for k in range(1, g + 1):
            left = left | jnp.concatenate(
                [jnp.zeros(k, bool), mask[:-k]])
            right = right | jnp.concatenate(
                [mask[k:], jnp.zeros(k, bool)])
        mask = mask | (left & right)

    # ---- raw runs (divideTrajectory :201-226) ----
    prev = jnp.concatenate([jnp.zeros(1, bool), mask[:-1]])
    starts = mask & ~prev
    run_id = jnp.cumsum(starts.astype(jnp.int32)) * mask - 1  # -1 inactive
    ids = jnp.arange(N)

    def run_info(r):
        inr = run_id == r
        any_r = jnp.any(inr)
        i0 = jnp.min(jnp.where(inr, ids, N))
        i1 = jnp.max(jnp.where(inr, ids, -1))
        t0 = times[jnp.clip(i0, 0, N - 1)]
        t1 = times[jnp.clip(i1, 0, N - 1)]
        dmin = jnp.min(jnp.where(inr, sample_dist, jnp.inf))
        return any_r, t0, t1, dmin

    any_r, t0s, t1s, dmins = jax.vmap(run_info)(jnp.arange(I))

    # ---- duration filter + gap merge (:229-256) ----
    T = times[-1]
    dur_thresh = jnp.minimum(params.min_time_interval_ratio * T,
                             params.min_time)
    gap_thresh = jnp.minimum(params.min_interval_diff_ratio * T,
                             params.min_time_diff)

    def merge_step(carry, inp):
        lo, hi, dist_z, valid, count, prev_end = carry
        a_r, t0, t1, dm = inp
        keep = a_r & ((t1 - t0) > dur_thresh)
        gap_ok = (t0 - prev_end) > gap_thresh
        is_first = count == 0
        # new zone: far enough from the previous kept zone (or first,
        # which merges back to t=0 per the reference's first-zone rule)
        new_idx = jnp.clip(count, 0, I - 1)
        open_new = keep & (gap_ok | is_first)
        t0_eff = jnp.where(is_first & ~gap_ok, 0.0, t0)
        lo = lo.at[new_idx].set(jnp.where(open_new, t0_eff, lo[new_idx]))
        hi = hi.at[new_idx].set(jnp.where(open_new, t1, hi[new_idx]))
        dist_z = dist_z.at[new_idx].set(
            jnp.where(open_new, dm, dist_z[new_idx]))
        valid = valid.at[new_idx].set(valid[new_idx] | open_new)
        # merge into the previous kept zone
        m_idx = jnp.clip(count - 1, 0, I - 1)
        do_merge = keep & ~gap_ok & ~is_first
        hi = hi.at[m_idx].set(jnp.where(do_merge, t1, hi[m_idx]))
        dist_z = dist_z.at[m_idx].set(
            jnp.where(do_merge, jnp.minimum(dist_z[m_idx], dm),
                      dist_z[m_idx]))
        count = count + open_new.astype(jnp.int32)
        prev_end = jnp.where(keep, t1, prev_end)
        return (lo, hi, dist_z, valid, count, prev_end), None

    init = (jnp.zeros(I), jnp.zeros(I), jnp.full(I, jnp.inf),
            jnp.zeros(I, bool), jnp.asarray(0, jnp.int32),
            jnp.asarray(0.0))
    (lo, hi, dist_z, valid, _, _), _ = jax.lax.scan(
        merge_step, init, (any_r, t0s, t1s, dmins))

    in_zone = jnp.any((times[:, None] >= lo[None, :])
                      & (times[:, None] <= hi[None, :])
                      & valid[None, :], axis=1)
    return DividerResult(in_zone=in_zone, t_lo=lo, t_hi=hi,
                         zone_valid=valid, obstacle_dist=dist_z,
                         sample_dist=sample_dist)


def zone_velocity_limits(res: DividerResult, v_max: float,
                         safe_dist: float,
                         v_floor_ratio: float = 0.3) -> jnp.ndarray:
    """Per-sample velocity limits for the TOPP stage: inside a braking
    zone the limit scales with the zone's obstacle clearance (the role
    of timeOptimizer::divideData's per-segment velocityLimits,
    timeOptimizer.cpp:42-124), floored at v_floor_ratio * v_max."""
    scale = jnp.clip(res.sample_dist / safe_dist, v_floor_ratio, 1.0)
    return jnp.where(res.in_zone, v_max * scale, v_max)

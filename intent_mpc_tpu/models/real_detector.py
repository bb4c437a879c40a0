"""Real-detector-in-the-loop: the depth-camera perception stack packaged
as an engine-side detector (EngineConfig.use_fake_detector=False).

The reference selects the full onboard_detector::dynamicDetector over the
GT fake detector with one flag (use_fake_detector, mpcNavigation.cpp:
129-136); the detector consumes depth frames and publishes tracked
dynamic-obstacle histories that dynamicPredictor::predict reads through
getDynamicObstaclesHist. This module is that composition for the array
engine, one fused jittable update per ~30 Hz history tick:

  render (models/sensor.render_depth, the Gazebo camera stand-in)
    -> project_depth (occupancyMap.cpp projectDepthImage)
    -> DBSCAN clusters -> fixed-shape AABB extraction
       (dynamicDetector.cpp detectionCB / clusterPointsAndBBoxes)
    -> const-vel KF track table (trackingCB :719-732)
    -> displacement voting (classificationCB :734-914)
    -> per-track history rings in the predictor's
       getDynamicObstaclesHist format (newest first, robot-inflated
       sizes, 2D range gate)

Fixed-shape design: detections live in `max_detections` padded slots,
tracks in `max_tracks` slots; the cluster extraction replaces the
reference's std::vector grouping with segment scatter-reductions keyed on
the DBSCAN label (= min point index of the cluster), so the whole update
jits and scans inside the closed-loop engine.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from intent_mpc_tpu.models import perception as pc
from intent_mpc_tpu.models import sensor
from intent_mpc_tpu.models.clustering import dbscan
from intent_mpc_tpu.models.occupancy import OccupancyGrid
from intent_mpc_tpu.utils.config import DetectorConfig, RealDetectorConfig


class PerceptionStats(NamedTuple):
    """Per-episode track-vs-GT quality accumulators (VERDICT r4 item 2a:
    quantify detector quality at protocol scale instead of inferring it
    from flight aggregates). Updated once per sense tick against the GT
    scene the camera images; the reference's analogue is the detector
    quality the dynamicDetector claims via its tracking/classification
    pipeline (dynamicDetector.cpp:710-914), never measured in-loop there.

      err_sq_sum / err_n : squared track->nearest-GT-center distance over
          matched live tracks (match gate 2 m) -> position RMSE
      missed_sum         : dynamic GT obstacles inside the camera frustum
          and sensor range with NO live track within 1.5 m (per tick)
      gt_in_fov_sum      : denominator for the miss rate
      spurious_sum       : dynamic-classified live tracks with no dynamic
          GT within 1.5 m (per tick)
      track_ticks_sum    : denominator for the spurious rate
      births_sum         : track (re)starts — identity churn / continuity
    """

    err_sq_sum: jnp.ndarray
    err_n: jnp.ndarray
    missed_sum: jnp.ndarray
    gt_in_fov_sum: jnp.ndarray
    spurious_sum: jnp.ndarray
    track_ticks_sum: jnp.ndarray
    births_sum: jnp.ndarray


def init_perception_stats() -> PerceptionStats:
    z = jnp.zeros((), jnp.float32)
    zi = jnp.zeros((), jnp.int32)
    return PerceptionStats(err_sq_sum=z, err_n=zi, missed_sum=zi,
                           gt_in_fov_sum=zi, spurious_sum=zi,
                           track_ticks_sum=zi, births_sum=zi)


class RealDetectorState(NamedTuple):
    tracks: pc.Tracks
    pos_hist: jnp.ndarray   # (T, Hh, 3) filtered positions, newest first
    vel_hist: jnp.ndarray   # (T, Hh, 3) filtered velocities
    hist_len: jnp.ndarray   # (T,) int32 valid history per track
    stats: PerceptionStats


def intrinsics(rd: RealDetectorConfig) -> pc.CameraIntrinsics:
    return pc.CameraIntrinsics(fx=rd.fx, fy=rd.fy, cx=rd.cx, cy=rd.cy,
                               depth_min=rd.depth_min, depth_max=rd.depth_max,
                               skip=rd.skip)


def init_real_detector(rd: RealDetectorConfig,
                       det: DetectorConfig) -> RealDetectorState:
    T, Hh = rd.max_tracks, det.history_size
    return RealDetectorState(
        tracks=pc.init_tracks(T),
        pos_hist=jnp.zeros((T, Hh, 3), jnp.float32),
        vel_hist=jnp.zeros((T, Hh, 3), jnp.float32),
        hist_len=jnp.zeros((T,), jnp.int32),
        stats=init_perception_stats())


def extract_detections(rd: RealDetectorConfig, pts: jnp.ndarray,
                       labels: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DBSCAN labels -> up to max_detections cluster AABBs, fixed shape.

    The reference groups points per cluster into vectors and AABBs them
    (clusterPointsAndBBoxes, dynamicDetector.cpp:1289-1356). Here each
    cluster is keyed by its label (= min member index): per-label counts
    and coordinate extrema come from scatter reductions, the label's own
    index slot acts as the cluster representative, and the
    `max_detections` largest clusters fill the detection slots."""
    P = pts.shape[0]
    member = labels >= 0
    lab = jnp.where(member, labels, P)                     # P = scrap bin
    counts = jnp.zeros(P + 1, jnp.int32).at[lab].add(1)
    big = jnp.float32(1e9)
    lo = jnp.full((P + 1, 3), big).at[lab].min(
        jnp.where(member[:, None], pts, big))
    hi = jnp.full((P + 1, 3), -big).at[lab].max(
        jnp.where(member[:, None], pts, -big))
    idx = jnp.arange(P)
    rep = (labels == idx) & (counts[idx] >= rd.min_cluster_pts)
    order = jnp.argsort(jnp.where(rep, -counts[idx], 1))[:rd.max_detections]
    det_valid = rep[order]
    det_pos = (lo[order] + hi[order]) / 2.0
    det_size = jnp.maximum(hi[order] - lo[order], rd.min_box_size)
    det_pos = jnp.where(det_valid[:, None], det_pos, 0.0)
    det_size = jnp.where(det_valid[:, None], det_size, 0.0)
    return det_pos, det_size, det_valid


def _in_frustum(rd: RealDetectorConfig, cam_pos: jnp.ndarray,
                cam_rot: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """GT centers visible to the camera: projects inside the image and
    depth within [depth_min, depth_max] (occlusion not modeled — a GT
    box behind another still counts, so the miss rate is conservative)."""
    q = (centers - cam_pos[None, :]) @ cam_rot          # world -> optical
    z = q[:, 2]
    u = rd.fx * q[:, 0] / jnp.maximum(z, 1e-6) + rd.cx
    v = rd.fy * q[:, 1] / jnp.maximum(z, 1e-6) + rd.cy
    return ((z > rd.depth_min) & (z < rd.depth_max)
            & (u >= 0) & (u < rd.im_w) & (v >= 0) & (v < rd.im_h))


def _dyn_with_veto(rd: RealDetectorConfig, tracks: pc.Tracks,
                   static_occ: Optional[OccupancyGrid]) -> jnp.ndarray:
    """Dynamic classification, optionally vetoed for tracks whose center
    sits inside the prebuilt static map's occupied cells
    (RealDetectorConfig.static_map_veto): the map composition already
    feeds those obstacles to the MPC via clustering rows, and a static
    pillar's visible-face centroid moves with the viewpoint — which the
    centroid-velocity vote misreads as motion (the reference's per-POINT
    voting, classificationCB :809-914, is robust to this; a full point
    cloud per track is not TPU-shaped, the map gate is)."""
    from intent_mpc_tpu.models.occupancy import is_occupied
    _, _, _, dyn = pc.dynamic_obstacles(tracks,
                                        vote_thresh=rd.dyn_vote_thresh)
    if static_occ is not None and rd.static_map_veto:
        in_static = jax.vmap(lambda p: is_occupied(static_occ, p))(
            tracks.pos)
        dyn = dyn & ~in_static
    return dyn


def _update_stats(rd: RealDetectorConfig, det: DetectorConfig,
                  stats: PerceptionStats, tracks: pc.Tracks,
                  fresh: jnp.ndarray, cam_pos: jnp.ndarray,
                  cam_rot: jnp.ndarray, drone_pos: jnp.ndarray,
                  obs_pos: jnp.ndarray, obs_dynamic: jnp.ndarray,
                  static_occ: Optional[OccupancyGrid] = None
                  ) -> PerceptionStats:
    live = tracks.live
    dyn = _dyn_with_veto(rd, tracks, static_occ)
    # pairwise track->GT center distances (T, O)
    d = jnp.linalg.norm(tracks.pos[:, None, :] - obs_pos[None, :, :],
                        axis=-1)
    big = jnp.float32(1e9)
    nearest_any = jnp.min(d, axis=1)
    matched = live & (nearest_any < 2.0)
    # dynamic GT in the frustum and sensor range with no live track nearby
    in_rng = jnp.linalg.norm(obs_pos[:, 0:2] - drone_pos[None, 0:2],
                             axis=-1) <= det.sensor_range
    gt_vis = obs_dynamic & in_rng & _in_frustum(rd, cam_pos, cam_rot,
                                                obs_pos)
    d_to_live = jnp.min(jnp.where(live[:, None], d, big), axis=0)
    missed = gt_vis & (d_to_live > 1.5)
    # dynamic-classified track with no dynamic GT within the gate
    d_dyn_gt = jnp.min(jnp.where(obs_dynamic[None, :], d, big), axis=1)
    spurious = live & dyn & (d_dyn_gt > 1.5)
    return PerceptionStats(
        err_sq_sum=stats.err_sq_sum
        + jnp.sum(jnp.where(matched, nearest_any ** 2, 0.0)),
        err_n=stats.err_n + jnp.sum(matched.astype(jnp.int32)),
        missed_sum=stats.missed_sum + jnp.sum(missed.astype(jnp.int32)),
        gt_in_fov_sum=stats.gt_in_fov_sum
        + jnp.sum(gt_vis.astype(jnp.int32)),
        spurious_sum=stats.spurious_sum
        + jnp.sum(spurious.astype(jnp.int32)),
        track_ticks_sum=stats.track_ticks_sum
        + jnp.sum((live & dyn).astype(jnp.int32)),
        births_sum=stats.births_sum
        + jnp.sum((live & fresh).astype(jnp.int32)))


def sense_and_track(rd: RealDetectorConfig, det: DetectorConfig,
                    state: RealDetectorState, drone_pos: jnp.ndarray,
                    yaw: jnp.ndarray, obs_pos: jnp.ndarray,
                    obs_size: jnp.ndarray, obs_active: jnp.ndarray,
                    occ: Optional[OccupancyGrid] = None,
                    obs_dynamic: Optional[jnp.ndarray] = None,
                    static_occ: Optional[OccupancyGrid] = None
                    ) -> RealDetectorState:
    """One ~30 Hz perception tick: render a depth frame at the drone's
    pose, detect, associate/track, classify, and push the track history.

    obs_pos/size (O, 3) are the world's GROUND-TRUTH boxes — they are
    only the scene geometry the camera images (the Gazebo stand-in);
    everything downstream sees pixels. occ adds the static voxel grid to
    the rendered scene (prebuilt-map worlds)."""
    intr = intrinsics(rd)
    cam_pos = drone_pos + jnp.array([0.0, 0.0, rd.cam_z_offset])
    R = sensor.yaw_camera_rotation(yaw)
    depth = sensor.render_depth(intr, rd.im_h, rd.im_w, cam_pos, R,
                                obs_pos, obs_size, obs_active,
                                max_depth=rd.depth_max)
    if occ is not None and occ.grid.size > 1:
        d_grid = sensor.render_depth_grid(intr, rd.im_h, rd.im_w, cam_pos,
                                          R, occ, max_depth=rd.depth_max)
        # nearest return wins; zeros mean no return on that branch
        both = (depth > 0) & (d_grid > 0)
        depth = jnp.where(both, jnp.minimum(depth, d_grid),
                          jnp.maximum(depth, d_grid))
    pts, valid = pc.project_depth(intr, depth, cam_pos, R)
    labels = dbscan(pts, valid, eps=rd.dbscan_eps, min_pts=rd.dbscan_min_pts)
    det_pos, det_size, det_valid = extract_detections(rd, pts, labels)
    dt = det.history_period
    tracks = pc.track_step(state.tracks, det_pos, det_size, det_valid, dt,
                           match_max_dist=rd.match_max_dist,
                           dyn_vel_thresh=rd.dyn_vel_thresh,
                           miss_max=rd.miss_max)
    # history rings follow the fake detector's histCB semantics (newest at
    # index 0); a slot that died or was re-opened restarts its history
    fresh = tracks.age <= 1
    ph = jnp.roll(state.pos_hist, 1, axis=1).at[:, 0].set(tracks.pos)
    vh = jnp.roll(state.vel_hist, 1, axis=1).at[:, 0].set(tracks.vel)
    ph = jnp.where(fresh[:, None, None], tracks.pos[:, None, :], ph)
    vh = jnp.where(fresh[:, None, None], 0.0, vh)
    Hh = state.pos_hist.shape[1]
    hist_len = jnp.where(tracks.live,
                         jnp.where(fresh, 1,
                                   jnp.minimum(state.hist_len + 1, Hh)), 0)
    if obs_dynamic is None:
        obs_dynamic = obs_active
    stats = _update_stats(rd, det, state.stats, tracks, fresh, cam_pos, R,
                          drone_pos, obs_pos, obs_dynamic & obs_active,
                          static_occ=static_occ)
    return RealDetectorState(tracks=tracks, pos_hist=ph, vel_hist=vh,
                             hist_len=hist_len, stats=stats)


def query_history(rd: RealDetectorConfig, det: DetectorConfig,
                  state: RealDetectorState, robot_pos: jnp.ndarray,
                  static_occ: Optional[OccupancyGrid] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """getDynamicObstaclesHist over the track table: histories +
    robot-inflated sizes + the classification/range gate. Matches the
    fake detector's query_history tuple so the engine's predictor/MPC
    path is identical downstream."""
    T, Hh, _ = state.pos_hist.shape
    robot = jnp.asarray(det.robot_size)
    base = state.tracks.size + robot
    if rd.kf_size_inflation > 0.0:
        # uncertainty-aware margin: the track's KF position std joins the
        # reported size exactly as the predictor's z-score sample std
        # joins predicted sizes (genTraj, dynamicPredictor.cpp:503-538)
        T_idx = jnp.arange(3)
        pos_std = jnp.sqrt(jnp.clip(
            state.tracks.P[:, T_idx, T_idx], 0.0, None))       # (T,3)
        base = base + 2.0 * rd.kf_size_inflation * pos_std
    size = jnp.broadcast_to(base[:, None, :], (T, Hh, 3))
    vel = state.vel_hist.at[..., 2].set(0.0)
    acc = jnp.zeros_like(vel)   # const-vel KF publishes no acceleration
    d2 = jnp.linalg.norm(state.pos_hist[:, 0, 0:2] - robot_pos[0:2],
                         axis=-1)
    dyn = _dyn_with_veto(rd, state.tracks, static_occ)
    visible = dyn & (d2 <= det.sensor_range) & (state.hist_len > 0)
    return state.pos_hist, vel, acc, size, state.hist_len, visible

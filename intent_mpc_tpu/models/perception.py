"""Depth-camera dynamic-obstacle detection & tracking (the "real detector").

Rebuild of onboard_detector's dynamicDetector pipeline (onboard_detector/
dynamicDetector.cpp) and helpers (kalmanFilter.cpp, uvDetector.cpp,
dbscan.cpp), vectorized:

  detectionCB (:710-717):   depth image -> point cloud (projectDepthImage
                            :1240-1279) -> voxel filter -> DBSCAN clusters
                            -> AABBs (clusterPointsAndBBoxes :1289-1356),
                            fused with U-map detections by IOU
                            (filterBBoxes :987+, calBoxIOU :1410-1443)
  trackingCB (:719-732):    linear propagation of previous boxes
                            (linearProp :1664-1673), feature-based best
                            match (genFeat/findBestMatch :1638-1735),
                            per-track constant-velocity Kalman filters
                            (kalmanFilterAndUpdateHist :1789-1943,
                            kalmanFilterMatrixVel :1945-1968)
  classificationCB (:734-914): dynamic-vs-static voting from displacement
                            of matched boxes against the propagated
                            position over a skip-frame horizon.

Fixed-shape design: tracks live in padded arrays with live-masks; the
depth image is dense; the U-map is a (depth-bin x column) histogram
reduced with segmented thresholding. Whole camera batches vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Generic linear Kalman filter (kalmanFilter.cpp:32-48)
# ---------------------------------------------------------------------------

class KalmanState(NamedTuple):
    x: jnp.ndarray   # (n,)
    P: jnp.ndarray   # (n, n)


def kalman_estimate(ks: KalmanState, A, B, H, Q, R, z, u) -> KalmanState:
    """One predict+update step (kalman_filter::estimate)."""
    x = A @ ks.x + B @ u
    P = A @ ks.P @ A.T + Q
    S = R + H @ P @ H.T
    K = P @ H.T @ jnp.linalg.inv(S)
    x = x + K @ (z - H @ x)
    P = (jnp.eye(P.shape[0]) - K @ H) @ P
    return KalmanState(x=x, P=P)


def const_vel_matrices(dt: float, eq: float = 0.33, er: float = 0.1):
    """Constant-velocity model (kalmanFilterMatrixVel :1945-1968):
    states [x y z vx vy vz], observation [x y z vx vy vz] (position +
    finite-difference velocity)."""
    A = jnp.eye(6).at[0:3, 3:6].set(jnp.eye(3) * dt)
    B = jnp.zeros((6, 1))
    H = jnp.eye(6)
    Q = jnp.eye(6) * eq
    R = jnp.eye(6) * er
    return A, B, H, Q, R


def const_acc_matrices(dt: float, eq: float = 0.33, er: float = 0.1):
    """Constant-acceleration model (kalmanFilterMatrixAcc :1970-2000):
    states [p v a] (9), observation [p v] (position + finite-difference
    velocity); acceleration is estimated, not observed."""
    I3 = jnp.eye(3)
    A = jnp.eye(9).at[0:3, 3:6].set(I3 * dt) \
        .at[0:3, 6:9].set(I3 * 0.5 * dt * dt) \
        .at[3:6, 6:9].set(I3 * dt)
    B = jnp.zeros((9, 1))
    H = jnp.zeros((6, 9)).at[0:6, 0:6].set(jnp.eye(6))
    Q = jnp.eye(9) * eq
    R = jnp.eye(6) * er
    return A, B, H, Q, R


# ---------------------------------------------------------------------------
# Depth image -> point cloud (projectDepthImage :1240-1279)
# ---------------------------------------------------------------------------

class CameraIntrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    depth_scale: float = 1000.0
    depth_min: float = 0.5
    depth_max: float = 5.0
    skip: int = 2            # depth_skip_pixel


def project_depth(intr: CameraIntrinsics, depth: jnp.ndarray,
                  cam_pos: jnp.ndarray, cam_rot: jnp.ndarray):
    """depth (H, W) raw -> world points ((H//skip)*(W//skip), 3) + valid."""
    H, W = depth.shape
    s = intr.skip
    d = depth[::s, ::s].astype(jnp.float32) / intr.depth_scale
    vv, uu = jnp.meshgrid(jnp.arange(0, H, s), jnp.arange(0, W, s),
                          indexing="ij")
    x = (uu - intr.cx) * d / intr.fx
    y = (vv - intr.cy) * d / intr.fy
    pts_cam = jnp.stack([x, y, d], axis=-1).reshape(-1, 3)
    valid = ((d >= intr.depth_min) & (d <= intr.depth_max)).reshape(-1)
    pts_world = pts_cam @ cam_rot.T + cam_pos[None, :]
    return pts_world, valid


def voxel_filter(points: jnp.ndarray, valid: jnp.ndarray, res: float,
                 origin) -> jnp.ndarray:
    """Keep one point per voxel (voxelFilter :1358-1384): mask duplicates
    via scatter of first-owner indices."""
    idx = jnp.floor((points - jnp.asarray(origin)) / res).astype(jnp.int32)
    key = (idx[:, 0] * 73856093) ^ (idx[:, 1] * 19349663) ^ (idx[:, 2] * 83492791)
    key = jnp.abs(key) % (4 * points.shape[0] + 1)
    P = points.shape[0]
    owner = jnp.full(4 * P + 1, P, jnp.int32).at[
        jnp.where(valid, key, 4 * P)].min(jnp.arange(P, dtype=jnp.int32))
    return valid & (owner[key] == jnp.arange(P))


# ---------------------------------------------------------------------------
# U-map detector (uvDetector.cpp: U-map histogram + band extraction)
# ---------------------------------------------------------------------------

def u_map_detect(intr: CameraIntrinsics, depth: jnp.ndarray,
                 num_bins: int = 32, min_hits: int = 10,
                 max_boxes: int = 8):
    """Column-depth histogram detector: bins with enough support become
    obstacle bands; contiguous columns merge into 2D boxes with a depth
    estimate. Returns (boxes (max_boxes, 4): [u_min, u_max, depth, height],
    valid (max_boxes,))."""
    H, W = depth.shape
    d = depth.astype(jnp.float32) / intr.depth_scale
    ok = (d >= intr.depth_min) & (d <= intr.depth_max)
    bin_idx = jnp.clip(((d - intr.depth_min)
                        / (intr.depth_max - intr.depth_min)
                        * num_bins).astype(jnp.int32), 0, num_bins - 1)
    # U-map: (num_bins, W) histogram of depth hits per column
    flat = bin_idx * W + jnp.broadcast_to(jnp.arange(W)[None, :], (H, W))
    umap = jnp.zeros(num_bins * W).at[
        jnp.where(ok, flat, num_bins * W - 1).reshape(-1)
    ].add(ok.reshape(-1).astype(jnp.float32)).reshape(num_bins, W)

    strong = umap >= min_hits                       # (bins, W)
    # contiguous column runs PER DEPTH BIN (the U-map's 2D bands)
    prev = jnp.concatenate([jnp.zeros((num_bins, 1), bool), strong[:, :-1]],
                           axis=1)
    starts = strong & ~prev
    run_id = jnp.cumsum(starts.astype(jnp.int32), axis=1) * strong - 1
    cols = jnp.arange(W)
    runs_per_bin = 4

    def bin_boxes(b):
        def box(r):
            m = run_id[b] == r
            any_m = jnp.any(m)
            u0 = jnp.min(jnp.where(m, cols, W))
            u1 = jnp.max(jnp.where(m, cols, -1))
            dep = intr.depth_min + (b + 0.5) / num_bins \
                * (intr.depth_max - intr.depth_min)
            inb = ok & (bin_idx == b) & m[None, :]
            rows = jnp.arange(H)[:, None]
            v0 = jnp.min(jnp.where(inb, rows, H))
            v1 = jnp.max(jnp.where(inb, rows, -1))
            support = jnp.sum(jnp.where(m, umap[b], 0.0))
            return (jnp.stack([u0.astype(jnp.float32),
                               u1.astype(jnp.float32), dep,
                               (v1 - v0).astype(jnp.float32)]),
                    any_m, support)
        return jax.vmap(box)(jnp.arange(runs_per_bin))

    boxes_all, valid_all, support_all = jax.vmap(bin_boxes)(
        jnp.arange(num_bins))
    boxes_all = boxes_all.reshape(-1, 4)
    valid_all = valid_all.reshape(-1)
    support_all = jnp.where(valid_all, support_all.reshape(-1), -1.0)
    top = jnp.argsort(-support_all)[:max_boxes]
    return boxes_all[top], valid_all[top]


# ---------------------------------------------------------------------------
# Boxes, IOU, tracking
# ---------------------------------------------------------------------------

def box_iou(c1, s1, c2, s2) -> jnp.ndarray:
    """Axis-aligned 3D IOU (calBoxIOU :1410-1443). c/s: (...,3)."""
    lo = jnp.maximum(c1 - s1 / 2, c2 - s2 / 2)
    hi = jnp.minimum(c1 + s1 / 2, c2 + s2 / 2)
    inter = jnp.prod(jnp.clip(hi - lo, 0.0, None), axis=-1)
    v1 = jnp.prod(s1, axis=-1)
    v2 = jnp.prod(s2, axis=-1)
    return inter / jnp.maximum(v1 + v2 - inter, 1e-9)


KF_AVG_FRAMES = 10   # kfAvgFrames_: velocity-observation FD window


class Tracks(NamedTuple):
    """Padded track table (the detector's boxHist/filters, fixed shape)."""
    pos: jnp.ndarray      # (T, 3) filtered position
    vel: jnp.ndarray      # (T, 3) filtered velocity
    size: jnp.ndarray     # (T, 3)
    P: jnp.ndarray        # (T, 6, 6) KF covariance
    age: jnp.ndarray      # (T,) frames tracked
    dyn_votes: jnp.ndarray  # (T,) dynamic-classification vote accumulator
    miss: jnp.ndarray     # (T,) consecutive unmatched frames (coasting)
    live: jnp.ndarray     # (T,) bool
    pos_hist: jnp.ndarray  # (T, KF_AVG_FRAMES, 3) filtered-position ring
                           # (boxHist_, newest at index 0) for the k-frame
                           # velocity observation


def init_tracks(max_tracks: int) -> Tracks:
    T = max_tracks
    return Tracks(pos=jnp.zeros((T, 3)), vel=jnp.zeros((T, 3)),
                  size=jnp.zeros((T, 3)),
                  P=jnp.tile(jnp.eye(6)[None], (T, 1, 1)),
                  age=jnp.zeros(T, jnp.int32),
                  dyn_votes=jnp.zeros(T),
                  miss=jnp.zeros(T, jnp.int32),
                  live=jnp.zeros(T, bool),
                  pos_hist=jnp.zeros((T, KF_AVG_FRAMES, 3)))


def track_step(tracks: Tracks, det_pos, det_size, det_valid, dt: float,
               match_max_dist: float = 1.5,
               dyn_vel_thresh: float = 0.3,
               miss_max: int = 10) -> Tracks:
    """One tracking cycle: propagate, associate, KF-update, classify.

    det_pos/size (D,3), det_valid (D,). Greedy nearest association against
    linearly-propagated tracks (linearProp + findBestMatch semantics with
    position features); unmatched detections open tracks in free slots;
    unmatched tracks COAST on the predict-only KF (the reference's
    out-of-range estimation, getDynamicObstaclesHist's kept-track
    semantics) and die after `miss_max` consecutive unmatched frames.
    """
    T = tracks.pos.shape[0]
    D = det_pos.shape[0]
    prop = tracks.pos + tracks.vel * dt                     # (T,3)

    d = jnp.linalg.norm(prop[:, None, :] - det_pos[None, :, :], axis=-1)
    d = jnp.where(tracks.live[:, None] & det_valid[None, :], d, jnp.inf)

    # greedy one-to-one: iterate D times picking the global best pair
    def pick(carry, _):
        dmat, t2d = carry
        flat = jnp.argmin(dmat)
        ti, di = flat // D, flat % D
        ok = dmat[ti, di] <= match_max_dist
        t2d = t2d.at[ti].set(jnp.where(ok, di, t2d[ti]))
        dmat = dmat.at[ti, :].set(jnp.inf)
        dmat = dmat.at[:, di].set(jnp.where(ok, jnp.inf, dmat[:, di]))
        return (dmat, t2d), None

    (_, t2d), _ = jax.lax.scan(pick, (d, jnp.full(T, -1, jnp.int32)), None,
                               length=min(T, D))
    matched = t2d >= 0
    det_idx = jnp.clip(t2d, 0, D - 1)

    # KF update for matched tracks (const-vel model). The velocity
    # observation differences the detection against the filtered position
    # k frames back over k*dt (getKalmanObservationVel,
    # dynamicDetector.cpp:1999-2015 with kfAvgFrames) — a 1-frame FD
    # against the lagging filtered state overshoots during ramp-in.
    A, B, H, Q, R = const_vel_matrices(dt)
    z_pos = det_pos[det_idx]
    T_idx = jnp.arange(T)
    k = jnp.clip(tracks.age, 1, KF_AVG_FRAMES)              # (T,)
    prev = tracks.pos_hist[T_idx, k - 1]                    # (T,3)
    z_vel = (z_pos - prev) / (dt * k[:, None])
    z = jnp.concatenate([z_pos, z_vel], axis=-1)            # (T,6)
    xk = jnp.concatenate([tracks.pos, tracks.vel], axis=-1)

    def upd(x, P, zz):
        ks = kalman_estimate(KalmanState(x, P), A, B, H, Q, R, zz,
                             jnp.zeros(1))
        return ks.x, ks.P

    xs, Ps = jax.vmap(upd)(xk, tracks.P, z)
    # unmatched live tracks coast: predict-only state and covariance
    P_pred = jnp.einsum("ij,tjk,lk->til", A, tracks.P, A) + Q[None]
    new_pos = jnp.where(matched[:, None], xs[:, 0:3], prop)
    new_vel = jnp.where(matched[:, None], xs[:, 3:6], tracks.vel)
    new_P = jnp.where(matched[:, None, None], Ps, P_pred)
    new_size = jnp.where(matched[:, None], det_size[det_idx], tracks.size)

    # dynamic classification votes: displacement against propagation
    speed = jnp.linalg.norm(new_vel[:, 0:2], axis=-1)
    votes = jnp.clip(tracks.dyn_votes + jnp.where(
        matched, jnp.where(speed > dyn_vel_thresh, 1.0, -0.5), 0.0),
        0.0, 10.0)

    miss = jnp.where(matched, 0, tracks.miss + 1)
    live = tracks.live & (matched | (miss <= miss_max))
    age = jnp.where(live, tracks.age + 1, 0)

    # open new tracks for unmatched detections
    det_used = jnp.any((t2d[:, None] == jnp.arange(D)[None, :])
                       & matched[:, None], axis=0)
    det_new = det_valid & ~det_used

    def open_slot(state, di):
        pos, vel, size, P, age, votes, miss, live = state
        free = jnp.argmin(live)                     # first dead slot
        can = det_new[di] & ~live[free]
        pos = pos.at[free].set(jnp.where(can, det_pos[di], pos[free]))
        vel = vel.at[free].set(jnp.where(can, 0.0, vel[free]))
        size = size.at[free].set(jnp.where(can, det_size[di], size[free]))
        P = P.at[free].set(jnp.where(can, jnp.eye(6), P[free]))
        age = age.at[free].set(jnp.where(can, 1, age[free]))
        votes = votes.at[free].set(jnp.where(can, 0.0, votes[free]))
        miss = miss.at[free].set(jnp.where(can, 0, miss[free]))
        live = live.at[free].set(live[free] | can)
        return (pos, vel, size, P, age, votes, miss, live), None

    state = (new_pos, new_vel, new_size, new_P, age, votes, miss, live)
    state, _ = jax.lax.scan(open_slot, state, jnp.arange(D))
    pos, vel, size, P, age, votes, miss, live = state
    # push the new filtered position into the per-track history ring;
    # fresh tracks (age==1) seed the whole ring with their first position
    hist = jnp.roll(tracks.pos_hist, 1, axis=1).at[:, 0].set(pos)
    hist = jnp.where((age <= 1)[:, None, None], pos[:, None, :], hist)
    return Tracks(pos=pos, vel=vel, size=size, P=P, age=age,
                  dyn_votes=votes, miss=miss, live=live, pos_hist=hist)


def dynamic_obstacles(tracks: Tracks, vote_thresh: float = 2.0):
    """Tracks classified dynamic (classificationCB voting outcome)."""
    dyn = tracks.live & (tracks.dyn_votes >= vote_thresh)
    return tracks.pos, tracks.vel, tracks.size, dyn


# ---------------------------------------------------------------------------
# Bird-view (V-map) stage of the U-V detector (uvDetector.cpp:518-569
# extract_bird_view + UVtracker:43-155 check_status). The reference
# converts U-map boxes to metric bird's-eye rectangles and tracks them
# frame-to-frame by overlap-or-distance association; the track history
# feeds its 2D Kalman velocity estimate.
# ---------------------------------------------------------------------------

def bird_view_boxes(intr: CameraIntrinsics, uboxes: jnp.ndarray,
                    valid: jnp.ndarray, num_bins: int = 32) -> jnp.ndarray:
    """U-map boxes -> bird's-eye metric rectangles (extract_bird_view).

    uboxes (B, 4): [u_min, u_max, depth, pixel height] from u_map_detect.
    Returns (B, 4): [x_left, y_near, width, depth_extent] in meters, in
    the camera's ground frame (x lateral from optical axis, y = depth).
    The reference takes the box's depth-bin extent as the body depth and
    centers the body behind the observed front face
    (uvDetector.cpp:524-533)."""
    bin_w = (intr.depth_max - intr.depth_min) / num_bins
    depth = uboxes[:, 2]
    width = depth * (uboxes[:, 1] - uboxes[:, 0]) / intr.fx
    x_left = depth * (uboxes[:, 0] - intr.cx) / intr.fx
    y_near = depth - 0.5 * bin_w
    out = jnp.stack([x_left, y_near, width,
                     jnp.full_like(depth, bin_w)], axis=-1)
    return jnp.where(valid[:, None], out, 0.0)


class BirdTracks(NamedTuple):
    """Fixed-shape bird's-eye track table (UVtracker state)."""
    box: jnp.ndarray     # (T, 4) [x, y, w, h]
    vel: jnp.ndarray     # (T, 2) center velocity (m/s)
    age: jnp.ndarray     # (T,) frames tracked
    live: jnp.ndarray    # (T,) bool


def init_bird_tracks(max_tracks: int) -> BirdTracks:
    T = max_tracks
    return BirdTracks(box=jnp.zeros((T, 4)), vel=jnp.zeros((T, 2)),
                      age=jnp.zeros(T, jnp.int32),
                      live=jnp.zeros(T, bool))


def _rect_overlap(b1, b2):
    """Intersection area of [x, y, w, h] rects."""
    lo = jnp.maximum(b1[..., 0:2], b2[..., 0:2])
    hi = jnp.minimum(b1[..., 0:2] + b1[..., 2:4], b2[..., 0:2] + b2[..., 2:4])
    wh = jnp.clip(hi - lo, 0.0, None)
    return wh[..., 0] * wh[..., 1]


def bird_track_step(tracks: BirdTracks, boxes: jnp.ndarray,
                    valid: jnp.ndarray, dt: float,
                    overlap_threshold: float = 0.5) -> BirdTracks:
    """One UVtracker::check_status cycle, fixed shape.

    A detection inherits a track when the overlap ratio (relative to
    EITHER rectangle, the reference's max(o/a_now, o/a_pre)) exceeds the
    threshold OR the center distance is below the mean combined-diagonal
    metric (uvDetector.cpp:94-100). Matched tracks update a
    finite-difference center velocity (the role of the reference's
    per-track 2D KF history); unmatched detections open fresh tracks."""
    T = tracks.box.shape[0]
    B = boxes.shape[0]
    ov = _rect_overlap(tracks.box[:, None, :], boxes[None, :, :])  # (T,B)
    a_pre = tracks.box[:, 2] * tracks.box[:, 3]
    a_now = boxes[:, 2] * boxes[:, 3]
    ratio = jnp.maximum(ov / jnp.maximum(a_now[None, :], 1e-9),
                        ov / jnp.maximum(a_pre[:, None], 1e-9))
    c_pre = tracks.box[:, 0:2] + tracks.box[:, 2:4] / 2
    c_now = boxes[:, 0:2] + boxes[:, 2:4] / 2
    dist = jnp.linalg.norm(c_pre[:, None] - c_now[None, :], axis=-1)
    metric = jnp.sqrt((tracks.box[:, 2:3] + boxes[None, :, 2]) ** 2
                      + (tracks.box[:, 3:4] + boxes[None, :, 3]) ** 2) / 2
    ok = ((ratio >= overlap_threshold) | (dist <= metric)) \
        & tracks.live[:, None] & valid[None, :]

    # greedy one-to-one by descending overlap ratio
    score = jnp.where(ok, ratio + 1.0 / (1.0 + dist), -jnp.inf)

    def pick(carry, _):
        s, t2d = carry
        flat = jnp.argmax(s)
        ti, di = flat // B, flat % B
        hit = s[ti, di] > -jnp.inf
        t2d = t2d.at[ti].set(jnp.where(hit, di, t2d[ti]))
        s = s.at[ti, :].set(-jnp.inf)
        s = jnp.where(hit, s.at[:, di].set(-jnp.inf), s)
        return (s, t2d), None

    (_, t2d), _ = jax.lax.scan(pick, (score, jnp.full(T, -1, jnp.int32)),
                               None, length=min(T, B))
    matched = t2d >= 0
    di = jnp.clip(t2d, 0, B - 1)
    new_c = c_now[di]
    vel = jnp.where(matched[:, None], (new_c - c_pre) / dt, tracks.vel)
    box = jnp.where(matched[:, None], boxes[di], tracks.box)
    age = jnp.where(matched, tracks.age + 1, 0)
    live = tracks.live & matched

    det_used = jnp.any((t2d[:, None] == jnp.arange(B)[None, :])
                       & matched[:, None], axis=0)
    det_new = valid & ~det_used

    def open_slot(state, bi):
        box, vel, age, live = state
        free = jnp.argmin(live)
        can = det_new[bi] & ~live[free]
        box = box.at[free].set(jnp.where(can, boxes[bi], box[free]))
        vel = vel.at[free].set(jnp.where(can, 0.0, vel[free]))
        age = age.at[free].set(jnp.where(can, 1, age[free]))
        live = live.at[free].set(live[free] | can)
        return (box, vel, age, live), None

    state, _ = jax.lax.scan(open_slot, (box, vel, age, live),
                            jnp.arange(B))
    box, vel, age, live = state
    return BirdTracks(box=box, vel=vel, age=age, live=live)


# ---------------------------------------------------------------------------
# Detection fusion (dynamicDetector::filterBBoxes :987-1136)
# ---------------------------------------------------------------------------

def fuse_mutual_best(uv_pos, uv_size, uv_valid, db_pos, db_size, db_valid,
                     iou_thresh: float = 0.5):
    """Mutual-best-IOU fusion of U-V and DBSCAN boxes (:993-1031).

    A pair survives only if each box is the other's best IOU match and
    both IOUs clear the threshold; the fused box is the conservative
    union AABB. Returns (pos (U,3), size (U,3), valid (U,)) indexed by
    the uv slot."""
    iou = box_iou(uv_pos[:, None], uv_size[:, None],
                  db_pos[None, :], db_size[None, :])       # (U, D)
    iou = jnp.where(uv_valid[:, None] & db_valid[None, :], iou, -1.0)
    best_db = jnp.argmax(iou, axis=1)                      # (U,)
    best_uv = jnp.argmax(iou, axis=0)                      # (D,)
    mutual = best_uv[best_db] == jnp.arange(uv_pos.shape[0])
    ok = mutual & (jnp.max(iou, axis=1) > iou_thresh)
    mp = db_pos[best_db]
    ms = db_size[best_db]
    hi = jnp.maximum(uv_pos + uv_size / 2, mp + ms / 2)
    lo = jnp.minimum(uv_pos - uv_size / 2, mp - ms / 2)
    return (hi + lo) / 2, hi - lo, ok


def project_box_to_image(intr: CameraIntrinsics, center_w, size_w,
                         cam_pos, cam_rot):
    """3D world box -> image-plane rect [tlx, tly, w, h] at center depth
    (filterBBoxes :1040-1076: corners projected at the center's z)."""
    c = (center_w - cam_pos) @ cam_rot                     # world -> cam
    z = jnp.maximum(c[..., 2], 1e-3)
    s = size_w
    tlx = (intr.fx * (c[..., 0] - s[..., 0] / 2) + intr.cx * z) / z
    tly = (intr.fy * (c[..., 1] - s[..., 1] / 2) + intr.cy * z) / z
    brx = (intr.fx * (c[..., 0] + s[..., 0] / 2) + intr.cx * z) / z
    bry = (intr.fy * (c[..., 1] + s[..., 1] / 2) + intr.cy * z) / z
    return jnp.stack([tlx, tly, brx - tlx, bry - tly], axis=-1)


def fuse_external_2d(intr: CameraIntrinsics, centers_w, sizes_w, valid,
                     cam_pos, cam_rot, det2d, det2d_valid,
                     iou_thresh: float = 0.5):
    """External 2D-detection fusion (the reference's YOLO branch,
    filterBBoxes :1035-1133): each external image-plane detection
    [tlx, tly, w, h] marks its best-IOU projected 3D box as
    dynamic/human. Detector-agnostic: any (rect, valid) stream works.
    Returns (is_dynamic (B,), is_human (B,)) flags for the 3D boxes."""
    rects = project_box_to_image(intr, centers_w, sizes_w, cam_pos, cam_rot)
    ov = _rect_overlap(det2d[:, None, :], rects[None, :, :])   # (D, B)
    a_d = det2d[:, 2] * det2d[:, 3]
    a_r = rects[:, 2] * rects[:, 3]
    union = a_d[:, None] + a_r[None, :] - ov
    iou = jnp.where(union > 0, ov / jnp.maximum(union, 1e-9), 0.0)
    iou = jnp.where(det2d_valid[:, None] & valid[None, :], iou, 0.0)
    best = jnp.argmax(iou, axis=1)                             # (D,)
    hit = jnp.max(iou, axis=1) > iou_thresh
    # scatter-max of hit flags onto each detection's best box
    flags = jnp.zeros(centers_w.shape[0], bool).at[best].max(hit)
    return flags, flags

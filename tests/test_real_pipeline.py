"""Real-perception chain: rendered depth frames -> DBSCAN detection ->
KF tracking -> intent prediction.

The reference's non-GT path is dynamicDetector (depth in, tracked boxes
out, dynamicDetector.cpp detectionCB/trackingCB/classificationCB)
feeding dynamicPredictor through getDynamicObstaclesHist. This test runs
that chain on synthesized sensor data end to end: a box crossing the
camera's view is detected per frame from rendered depth, tracked with
the const-vel KF, classified dynamic by displacement voting, and its
track history drives the Markov intent predictor to a sensible forward
hypothesis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intent_mpc_tpu.models import perception as pc
from intent_mpc_tpu.models import predictor as predlib
from intent_mpc_tpu.models import sensor
from intent_mpc_tpu.models.clustering import dbscan
from intent_mpc_tpu.models.occupancy import empty_grid
from intent_mpc_tpu.utils.config import PredictorConfig

INTR = pc.CameraIntrinsics(fx=80.0, fy=80.0, cx=48.0, cy=32.0,
                           depth_min=0.3, depth_max=9.0, skip=2)
IMH, IMW = 64, 96


def _detect(depth, cam, R):
    """Depth frame -> (det_pos, det_size, det_valid) via projected-point
    DBSCAN (detectionCB's cluster path)."""
    pts, valid = pc.project_depth(INTR, depth, cam, R)
    labels = np.asarray(dbscan(pts, valid, eps=0.5, min_pts=6))
    pts = np.asarray(pts)
    det_pos = np.zeros((4, 3), np.float32)
    det_size = np.zeros((4, 3), np.float32)
    det_valid = np.zeros(4, bool)
    for j, lab in enumerate(sorted({int(l) for l in labels if l >= 0})[:4]):
        sel = pts[labels == lab]
        lo, hi = sel.min(axis=0), sel.max(axis=0)
        det_pos[j] = (lo + hi) / 2.0
        det_size[j] = np.maximum(hi - lo, 0.2)
        det_valid[j] = True
    return (jnp.asarray(det_pos), jnp.asarray(det_size),
            jnp.asarray(det_valid))


@pytest.mark.slow
def test_sensor_tracking_prediction_chain():
    cam = jnp.array([0.0, 0.0, 1.5])
    R = sensor.yaw_camera_rotation(jnp.asarray(0.0))  # facing +x
    size = jnp.array([[0.8, 0.8, 0.8]])
    dt = 1.0 / 30.0
    n_frames = 24

    tracks = pc.init_tracks(4)
    hist_pos, hist_vel = [], []
    for k in range(n_frames):
        # box crosses the view: +y at 1.2 m/s, 4 m ahead
        c = jnp.array([[4.0, -1.3 + 1.2 * k * dt, 1.5]])
        depth = sensor.render_depth(INTR, IMH, IMW, cam, R, c, size,
                                    jnp.array([True]))
        det_pos, det_size, det_valid = _detect(depth, cam, R)
        assert bool(det_valid[0])  # the mover is seen every frame
        tracks = pc.track_step(tracks, det_pos, det_size, det_valid, dt)
        pos, vel, tsize, dyn = pc.dynamic_obstacles(tracks)
        hist_pos.append(np.asarray(pos[0]))
        hist_vel.append(np.asarray(vel[0]))

    # classification: the mover is flagged dynamic with ~(0, 1.2, 0) m/s
    pos, vel, tsize, dyn = pc.dynamic_obstacles(tracks)
    assert bool(dyn[0]), np.asarray(tracks.dyn_votes)
    v = np.asarray(vel[0])
    assert abs(v[1] - 1.2) < 0.4, v
    assert abs(v[0]) < 0.3, v
    # detected extent is in the right ballpark (front-face cluster)
    assert 0.3 < float(tsize[0, 1]) < 1.3

    # track history (newest first) drives the intent predictor
    P = PredictorConfig()
    Hh = 20
    ph = np.stack(hist_pos[-Hh:][::-1])          # (Hh,3) newest first
    vh = np.stack(hist_vel[-Hh:][::-1])
    pos_h = jnp.asarray(ph)[None]
    vel_h = jnp.asarray(vh)[None]
    acc_h = jnp.zeros_like(vel_h)
    size_h = jnp.broadcast_to(jnp.asarray(tsize[0]), (1, Hh, 3))
    pred = predlib.predict(P, pos_h, vel_h, acc_h, size_h,
                           jnp.full((1,), Hh), empty_grid())
    probs = np.asarray(pred.intent_prob[0])
    # steady mover: STOP negligible; FORWARD well above uniform (the
    # front-face centroid jitters as the box crosses pixel boundaries,
    # so a slight turning share is expected from the real pipeline)
    assert probs[predlib.STOP] < 0.1, probs
    assert probs[predlib.FORWARD] > 0.3, probs
    # the most-likely intent's rollout continues the +y motion
    am = int(probs.argmax())
    roll = np.asarray(pred.pos[0, am])
    assert roll[-1][1] > roll[0][1] + 0.5, roll[[0, -1]]

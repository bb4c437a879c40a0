"""Ground-truth detector: history ring buffers + finite-difference state.

Vectorized rebuild of onboardDetector::fakeDetector (onboard_detector/
fakeDetector.cpp). The ROS pipeline (50 Hz ModelStates callback with a
dT>=0.1 s finite-difference gate, 30 Hz history timer) becomes explicit
array updates driven by the engine's tick schedule:

  * fd_update: velocity = (pos - last_pos)/dT, acceleration =
    (vel - last_vel)/dT, refreshed when dT >= fd_period (stateCB :176-209)
  * hist_push: ring-buffer unshift, newest at index 0 (histCB :337-347)
  * query: robot-size inflation of sizes, z-velocity zeroed, 2D range gate
    (getDynamicObstaclesHist :525-553, isObstacleInSensorRange :482-500
    with fov=2*pi so only the `color_distance` range matters)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from intent_mpc_tpu.utils.config import DetectorConfig


class DetectorState(NamedTuple):
    pos_hist: jnp.ndarray    # (O, Hh, 3) newest at index 0
    vel_hist: jnp.ndarray    # (O, Hh, 3)
    acc_hist: jnp.ndarray    # (O, Hh, 3)
    hist_len: jnp.ndarray    # scalar int32
    last_pos: jnp.ndarray    # (O, 3) position at last FD update
    vel: jnp.ndarray         # (O, 3) currently-published FD velocity
    acc: jnp.ndarray         # (O, 3)
    last_fd_time: jnp.ndarray  # scalar


def init_detector(num_obstacles: int, cfg: DetectorConfig,
                  pos0: jnp.ndarray) -> DetectorState:
    O, Hh = num_obstacles, cfg.history_size
    z3 = jnp.zeros((O, 3), jnp.float32)
    return DetectorState(
        pos_hist=jnp.zeros((O, Hh, 3), jnp.float32),
        vel_hist=jnp.zeros((O, Hh, 3), jnp.float32),
        acc_hist=jnp.zeros((O, Hh, 3), jnp.float32),
        hist_len=jnp.asarray(0, jnp.int32),
        last_pos=pos0,
        vel=z3,
        acc=z3,
        last_fd_time=jnp.zeros((), jnp.float32),
    )


def fd_update(cfg: DetectorConfig, st: DetectorState, pos_now: jnp.ndarray,
              t) -> DetectorState:
    """Finite-difference velocity/acceleration when dT >= fd_period."""
    dT = t - st.last_fd_time
    due = dT >= cfg.fd_period - 1e-9
    safe_dT = jnp.maximum(dT, 1e-9)
    vel_new = (pos_now - st.last_pos) / safe_dT
    acc_new = (vel_new - st.vel) / safe_dT
    return st._replace(
        vel=jnp.where(due, vel_new, st.vel),
        acc=jnp.where(due, acc_new, st.acc),
        last_pos=jnp.where(due, pos_now, st.last_pos),
        last_fd_time=jnp.where(due, t, st.last_fd_time),
    )


def hist_push(st: DetectorState, pos_now: jnp.ndarray) -> DetectorState:
    """Unshift the current snapshot into the ring buffers."""
    def push(hist, row):
        return jnp.roll(hist, 1, axis=1).at[:, 0].set(row)
    Hh = st.pos_hist.shape[1]
    return st._replace(
        pos_hist=push(st.pos_hist, pos_now),
        vel_hist=push(st.vel_hist, st.vel),
        acc_hist=push(st.acc_hist, st.acc),
        hist_len=jnp.minimum(st.hist_len + 1, Hh),
    )


def query_history(cfg: DetectorConfig, st: DetectorState, bbox: jnp.ndarray,
                  robot_pos: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """getDynamicObstaclesHist: histories + robot-inflated sizes + range mask.

    bbox (O,3) static obstacle extents (decoded from the model name in the
    reference). Returns (pos, vel, acc, size, hist_len(O,), visible(O,))."""
    O, Hh, _ = st.pos_hist.shape
    robot = jnp.asarray(cfg.robot_size)
    size = jnp.broadcast_to(bbox[:, None, :] + robot, (O, Hh, 3))
    vel = st.vel_hist.at[..., 2].set(0.0)
    acc = st.acc_hist.at[..., 2].set(0.0)
    d2 = jnp.linalg.norm(st.pos_hist[:, 0, 0:2] - robot_pos[0:2], axis=-1)
    visible = (d2 <= cfg.sensor_range) & (st.hist_len > 0)
    hist_len = jnp.full((O,), st.hist_len)
    return st.pos_hist, vel, acc, size, hist_len, visible

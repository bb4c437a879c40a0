"""Tracking controller: cascaded PID -> commanded acceleration.

Rebuild of tracking_controller's acceleration output mode
(trackingController.cpp:426-523 computeAttitudeAndAccRef + :411-423
publishCommand). The reference computes
    accRef = accTarget + PID(posErr) + PID(velErr) + g
and publishes accRef - g as the acceleration setpoint; the attitude /
body-rate output modes and the hover-thrust Kalman estimator only matter
when flying PX4 hardware and are not part of the benchmark loop (the sim
quadcopter integrates the acceleration setpoint directly).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from intent_mpc_tpu.utils.config import ControlConfig


class ControllerState(NamedTuple):
    pos_err_int: jnp.ndarray   # (3,)
    vel_err_int: jnp.ndarray   # (3,)
    prev_pos_err: jnp.ndarray  # (3,)
    prev_vel_err: jnp.ndarray  # (3,)
    first: jnp.ndarray         # bool


def init_controller() -> ControllerState:
    z = jnp.zeros(3, jnp.float32)
    return ControllerState(z, z, z, z, jnp.asarray(True))


def acc_command(cfg: ControlConfig, st: ControllerState,
                pos: jnp.ndarray, vel: jnp.ndarray,
                target_pos: jnp.ndarray, target_vel: jnp.ndarray,
                target_acc: jnp.ndarray, dt: float
                ) -> Tuple[jnp.ndarray, ControllerState]:
    """One 100 Hz control step; returns commanded world-frame acceleration."""
    pos_err = target_pos - pos
    vel_err = target_vel - vel
    pos_int = st.pos_err_int + dt * pos_err
    vel_int = st.vel_err_int + dt * vel_err
    d_pos = jnp.where(st.first, 0.0, (pos_err - st.prev_pos_err) / dt)
    d_vel = jnp.where(st.first, 0.0, (vel_err - st.prev_vel_err) / dt)

    pp = jnp.asarray(cfg.position_p)
    pi = jnp.asarray(cfg.position_i)
    pd = jnp.asarray(cfg.position_d)
    vp = jnp.asarray(cfg.velocity_p)
    vi = jnp.asarray(cfg.velocity_i)
    vd = jnp.asarray(cfg.velocity_d)

    feedback = (pp * pos_err + pi * pos_int + pd * d_pos
                + vp * vel_err + vi * vel_int + vd * d_vel)
    acc_cmd = target_acc + feedback   # gravity added then re-subtracted (:497,:418)

    new = ControllerState(pos_err_int=pos_int, vel_err_int=vel_int,
                          prev_pos_err=pos_err, prev_vel_err=vel_err,
                          first=jnp.asarray(False))
    return acc_cmd, new


# ---------------------------------------------------------------------------
# Attitude / body-rate output modes + hover-thrust estimation
# (trackingController.cpp:500-550, :279-370 — used when flying PX4; the
# benchmark loop uses the acceleration mode above)
# ---------------------------------------------------------------------------

GRAVITY = 9.8


def acc_to_attitude(acc_ref_world: jnp.ndarray, yaw: jnp.ndarray
                    ) -> jnp.ndarray:
    """Desired attitude quaternion (w,x,y,z) from the total reference
    acceleration (including gravity) and a yaw heading
    (computeAttitudeAndAccRef :500-513): body z along accRef, body x
    toward yaw projected onto the plane."""
    z_d = acc_ref_world / jnp.maximum(jnp.linalg.norm(acc_ref_world), 1e-9)
    heading = jnp.stack([jnp.cos(yaw), jnp.sin(yaw), jnp.zeros_like(yaw)])
    y_d = jnp.cross(z_d, heading)
    y_d = y_d / jnp.maximum(jnp.linalg.norm(y_d), 1e-9)
    x_d = jnp.cross(y_d, z_d)
    x_d = x_d / jnp.maximum(jnp.linalg.norm(x_d), 1e-9)
    R = jnp.stack([x_d, y_d, z_d], axis=-1)
    return rot_to_quat(R)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w,x,y,z), Shepperd-stable enough for
    the near-hover attitudes this controller commands."""
    w = 0.5 * jnp.sqrt(jnp.clip(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 1e-9))
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return jnp.stack([w, x, y, z])


def quat_mult(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def body_rate_command(curr_quat: jnp.ndarray, ref_quat: jnp.ndarray,
                      acc_ref_world: jnp.ndarray, hover_thrust: float,
                      attitude_tau: float = 0.3) -> jnp.ndarray:
    """Body rates + thrust percent (computeBodyRate :525-550):
    rate = (2/tau) * sign(q_err_w) * q_err_vec; thrust = |accRef| scaled by
    the hover thrust. Returns (wx, wy, wz, thrust_pct)."""
    inv = curr_quat * jnp.array([1.0, -1.0, -1.0, -1.0])
    qe = quat_mult(inv, ref_quat)
    s = jnp.sign(qe[0]) + (qe[0] == 0)
    rates = (2.0 / attitude_tau) * s * qe[1:4]
    thrust = jnp.linalg.norm(acc_ref_world)
    pct = jnp.clip(thrust / (GRAVITY / hover_thrust), 0.0, 1.0)
    return jnp.concatenate([rates, pct[None]])


class ThrustEstimator(NamedTuple):
    """Scalar hover-thrust Kalman filter (thrustEstimateCB :279-370)."""
    hover_thrust: jnp.ndarray
    var: jnp.ndarray


def init_thrust_estimator(hover_thrust: float = 0.7,
                          var: float = 0.05) -> ThrustEstimator:
    return ThrustEstimator(hover_thrust=jnp.asarray(hover_thrust),
                           var=jnp.asarray(var))


def thrust_estimate_step(est: ThrustEstimator, cmd_thrust, world_acc_z,
                         process_var: float = 1e-6,
                         measure_var: float = 0.3) -> ThrustEstimator:
    """One estimator step: z = a_z - g; H = -cmd*g/hover^2."""
    h = est.hover_thrust
    var = est.var + process_var
    H = -(cmd_thrust * GRAVITY) / (h * h)
    z = world_acc_z - GRAVITY
    innov_var = jnp.maximum(H * var * H + measure_var, measure_var)
    K = var * H / innov_var
    innov = z - (cmd_thrust / h - 1.0) * GRAVITY
    new_h = h + K * innov
    new_var = (1.0 - K * H) * var
    ok = (new_h > 0.0) & (new_h < 1.0)
    return ThrustEstimator(hover_thrust=jnp.where(ok, new_h, h),
                           var=new_var)

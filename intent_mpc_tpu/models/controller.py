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

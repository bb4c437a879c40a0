"""Quadrotor rigid-body plant: the Gazebo quadcopterPlugin as arrays.

The reference closes its sim loop through a Gazebo model plugin
(uav_simulator/src/quadcopterPlugin.cpp): the tracking controller
publishes world-frame acceleration + yaw commands to
/CERLAB/quadcopter/cmd_acc, and the plugin's acc-control branch
(UpdateDynamics, quadcopterPlugin.cpp:370+) converts them to a body
z-force and body torques through cascaded PIDs, which Gazebo integrates
as a rigid body. This module is that plant as a pure function — the
higher-fidelity alternative to the engine's default double-integrator
(EngineConfig.plant = "quadrotor" selects it), closing the attitude
loop that the controller's attitude/body-rate output modes assume.

Transcribed structure (cites into the reference):

  * PID with setpoint limit + first-order input filter + wrap-aware yaw
    variant: pidController.cpp:32-105 (with time_constant = 0 the
    filtered-input derivative term is identically zero — reproduced).
  * acc-control force/torque law: quadcopterPlugin.cpp UpdateDynamics —
    desired body acc = R^T a_cmd; pitch_cmd = PID_accXY(des.x)/g,
    roll_cmd = -PID_accXY(des.y)/g; torques from rollpitch/yaw-rate
    PIDs scaled by inertia; Fz = m (PID_accZ(des.z) + load_factor g),
    load_factor = 1/cos(tilt), clamped to [0, maxForce].
  * gains/inertial params: urdf/quadcopter.urdf:4-63 (mass 1.54,
    I = diag(0.1152, 0.1152, 0.218), maxForce 60, accelerationXY P=15,
    accelerationZ P=0.5, rollpitch P=10 D=5 limit 1, yaw P=1.5 D=1
    limit 1.5, yawAngle P=3 limit 3.15).
  * rigid-body step: Gazebo's physics engine replaced by a semi-implicit
    Euler substep loop with the gyroscopic term omega x I omega and
    quaternion attitude integration (substeps=10 at the 100 Hz control
    tick reproduces Gazebo's 1 kHz physics rate).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PIDParams(NamedTuple):
    p: float
    d: float = 0.0
    i: float = 0.0
    limit: float = -1.0        # setpoint clamp; <= 0 disables
    time_constant: float = 0.0


class PIDState(NamedTuple):
    input: jnp.ndarray   # filtered setpoint
    dinput: jnp.ndarray  # filtered setpoint derivative
    i_acc: jnp.ndarray   # integral accumulator


def pid_init() -> PIDState:
    z = jnp.asarray(0.0, jnp.float32)
    return PIDState(input=z, dinput=z, i_acc=z)


def _wrap(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def pid_update(par: PIDParams, st: PIDState, new_input, x, dx, dt,
               is_yaw: bool = False):
    """PIDController::update (pidController.cpp:32-105). Returns
    (output, new_state). is_yaw: wrap-aware errors, P-only output."""
    if is_yaw:
        new_input = _wrap(jnp.where(jnp.isnan(new_input), 0.0, new_input))
        dx = _wrap(dx)
        x = _wrap(x)
    if par.limit > 0.0:
        new_input = jnp.clip(new_input, -par.limit, par.limit)
    denom = dt + par.time_constant
    inp = (dt * new_input + par.time_constant * st.input) / denom
    if is_yaw:
        inp = _wrap(inp * denom) / denom  # reference wraps the numerator
    dinp = (new_input - inp) / denom
    if is_yaw:
        dinp = _wrap(new_input - inp) / denom
        p = _wrap(inp - x)
        i_acc = _wrap(st.i_acc + dt * p)
        out = par.p * p  # yaw-angle controller is P-only (:95)
    else:
        p = inp - x
        d = dinp - dx
        i_acc = st.i_acc + dt * p
        out = par.p * p + par.d * d + par.i * i_acc
    return out, PIDState(input=inp, dinput=dinp, i_acc=i_acc)


class QuadPlantConfig(NamedTuple):
    """quadcopter.urdf:4-63 values."""
    mass: float = 1.54
    inertia: Tuple[float, float, float] = (0.1152, 0.1152, 0.218)
    gravity: float = 9.8
    max_force: float = 60.0
    substeps: int = 10
    acc_xy: PIDParams = PIDParams(p=15.0)
    acc_z: PIDParams = PIDParams(p=0.5)
    rollpitch: PIDParams = PIDParams(p=10.0, d=5.0, limit=1.0)
    yaw_rate: PIDParams = PIDParams(p=1.5, d=1.0, limit=1.5)
    yaw_angle: PIDParams = PIDParams(p=3.0, limit=3.15)


class QuadState(NamedTuple):
    pos: jnp.ndarray         # (3,) world
    vel: jnp.ndarray         # (3,) world
    quat: jnp.ndarray        # (4,) w,x,y,z body->world
    omega: jnp.ndarray       # (3,) body angular velocity
    prev_vel: jnp.ndarray    # (3,) world vel at last control tick (FD acc)
    prev_body_acc: jnp.ndarray  # (3,)
    pid_acc_x: PIDState
    pid_acc_y: PIDState
    pid_acc_z: PIDState
    pid_roll: PIDState
    pid_pitch: PIDState
    pid_yaw: PIDState
    pid_yaw_angle: PIDState


def quad_init(pos, vel=None, yaw: float = 0.0) -> QuadState:
    pos = jnp.asarray(pos, jnp.float32)
    vel = jnp.zeros(3, jnp.float32) if vel is None else jnp.asarray(vel)
    half = 0.5 * yaw
    quat = jnp.array([jnp.cos(half), 0.0, 0.0, jnp.sin(half)], jnp.float32)
    return QuadState(
        pos=pos, vel=vel, quat=quat, omega=jnp.zeros(3, jnp.float32),
        prev_vel=vel, prev_body_acc=jnp.zeros(3, jnp.float32),
        pid_acc_x=pid_init(), pid_acc_y=pid_init(), pid_acc_z=pid_init(),
        pid_roll=pid_init(), pid_pitch=pid_init(), pid_yaw=pid_init(),
        pid_yaw_angle=pid_init())


def _quat_to_mat(q):
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return jnp.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def quat_to_euler(q):
    """ZYX (roll about x, pitch about y, yaw about z) — ignition
    Quaternion::Euler convention used by the plugin."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    sp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sp)
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def _cascade_substep(cfg: QuadPlantConfig, st: QuadState, acc_cmd, yaw_cmd,
                     h: float) -> QuadState:
    """One PHYSICS step: full PID cascade + rigid-body integration at step
    h — exactly the plugin's Update() granularity. The plugin is connected
    to Gazebo's world-update event (quadcopterPlugin.cpp:334-350), so the
    WHOLE cascade (FD acceleration, acc/attitude/yaw PIDs, force/torque)
    re-evaluates every physics step (max_step_size 0.001 in the benchmark
    world, worlds/test/empty.world:73), NOT at the 100 Hz command rate.
    Round 2 ran the cascade once per 100 Hz control tick and substepped
    only the integration — a 10x slower inner attitude loop, the suspected
    source of the rigid-plant attitude lag (VERDICT r2 item 3; measured
    comparison in RESULTS.md)."""
    g = cfg.gravity
    m = cfg.mass
    inertia = jnp.asarray(cfg.inertia, jnp.float32)
    R = _quat_to_mat(st.quat)
    roll, pitch, yaw = quat_to_euler(st.quat)

    # FD world acceleration over the last physics step (plugin :382-384)
    acc_world = (st.vel - st.prev_vel) / h
    body_acc = R.T @ acc_world
    accchange = body_acc - st.prev_body_acc

    # load factor = 1 / cos(tilt) (plugin "Get gravity" block)
    gw = jnp.array([0.0, 0.0, -g])
    cos_tilt = jnp.dot(gw, R @ gw) / (g * g)
    load_factor = 1.0 / jnp.maximum(cos_tilt, 0.2)  # guarded near-inverted
    # (the plugin divides unguarded; the guard only differs past ~78 deg
    # tilt, where the benchmark flight never operates)

    # yaw-angle -> yaw-rate setpoint (P-only, wrapped)
    yaw_rate_sp, pid_yaw_angle = pid_update(
        cfg.yaw_angle, st.pid_yaw_angle, yaw_cmd, yaw, yaw_cmd - yaw, h,
        is_yaw=True)

    des_body = R.T @ jnp.asarray(acc_cmd)
    pitch_cmd, pid_acc_x = pid_update(cfg.acc_xy, st.pid_acc_x,
                                      des_body[0], body_acc[0],
                                      accchange[0], h)
    roll_cmd, pid_acc_y = pid_update(cfg.acc_xy, st.pid_acc_y,
                                     des_body[1], body_acc[1],
                                     accchange[1], h)
    pitch_cmd = pitch_cmd / g
    roll_cmd = -roll_cmd / g

    tq_x, pid_roll = pid_update(cfg.rollpitch, st.pid_roll, roll_cmd,
                                roll, st.omega[0], h)
    tq_y, pid_pitch = pid_update(cfg.rollpitch, st.pid_pitch, pitch_cmd,
                                 pitch, st.omega[1], h)
    fz_pid, pid_acc_z = pid_update(cfg.acc_z, st.pid_acc_z, des_body[2],
                                   body_acc[2], accchange[2], h)
    tq_z, pid_yaw = pid_update(cfg.yaw_rate, st.pid_yaw, yaw_rate_sp,
                               st.omega[2], 0.0, h)
    tq_z = jnp.where(jnp.isnan(tq_z), 0.0, tq_z)  # plugin NaN guard

    torque = inertia * jnp.array([tq_x, tq_y, tq_z])
    fz = m * (fz_pid + load_factor * g)
    fz = jnp.clip(fz, 0.0, cfg.max_force)

    pos, vel, quat, omega = _rigid_step(cfg, st, fz, torque, h)
    return QuadState(
        pos=pos, vel=vel, quat=quat, omega=omega,
        prev_vel=st.vel, prev_body_acc=body_acc,
        pid_acc_x=pid_acc_x, pid_acc_y=pid_acc_y, pid_acc_z=pid_acc_z,
        pid_roll=pid_roll, pid_pitch=pid_pitch, pid_yaw=pid_yaw,
        pid_yaw_angle=pid_yaw_angle)


def quad_step(cfg: QuadPlantConfig, st: QuadState, acc_cmd, yaw_cmd,
              dt: float) -> QuadState:
    """One 100 Hz control tick: the held (acc_cmd, yaw_cmd) command drives
    `substeps` full cascade+integration physics steps (1 kHz default),
    matching the plugin's world-update cadence."""
    h = dt / cfg.substeps

    def body(s, _):
        return _cascade_substep(cfg, s, acc_cmd, yaw_cmd, h), None

    st, _ = jax.lax.scan(body, st, None, length=cfg.substeps)
    return st


def _rigid_step(cfg: QuadPlantConfig, st: QuadState, fz, torque, h: float):
    """One rigid-body physics step (the Gazebo ODE step): semi-implicit
    Euler with the gyroscopic term and quaternion attitude."""
    m = cfg.mass
    inertia = jnp.asarray(cfg.inertia, jnp.float32)
    gw = jnp.array([0.0, 0.0, -cfg.gravity])
    pos, vel, quat, omega = st.pos, st.vel, st.quat, st.omega
    Rk = _quat_to_mat(quat)
    a = Rk @ jnp.array([0.0, 0.0, fz]) / m + gw
    vel = vel + a * h
    pos = pos + vel * h
    omega_dot = (torque - jnp.cross(omega, inertia * omega)) / inertia
    omega = omega + omega_dot * h
    dq = _quat_mul(quat, jnp.concatenate([jnp.zeros(1), omega]))
    quat = quat + 0.5 * dq * h
    quat = quat / jnp.linalg.norm(quat)
    return pos, vel, quat, omega


def _integrate(cfg: QuadPlantConfig, st: QuadState, fz, torque, dt: float):
    """Substepped rigid-body integration with force/torque HELD over the
    control tick (used by the body-rate branch, whose inner rate loop
    stands in for PX4's rather than the plugin's cascade)."""
    h = dt / cfg.substeps
    pos, vel, quat, omega = st.pos, st.vel, st.quat, st.omega
    cur = st
    for _ in range(cfg.substeps):
        pos, vel, quat, omega = _rigid_step(cfg, cur, fz, torque, h)
        cur = cur._replace(pos=pos, vel=vel, quat=quat, omega=omega)
    return pos, vel, quat, omega


def quad_step_bodyrate(cfg: QuadPlantConfig, st: QuadState, rate_sp,
                       thrust_pct, hover_thrust, dt: float,
                       rate_p: float = 20.0) -> QuadState:
    """One control tick consuming the tracking controller's BODY-RATE
    output mode (controller.body_rate_command: rates + thrust percent,
    trackingController.cpp:525-550). The inner rate loop — which PX4's
    rate controller provides on the real vehicle and the Gazebo plugin's
    yaw/rollpitch PIDs approximate — is a rate P-loop here; thrust
    percent maps through the hover calibration: Fz = pct * m*g/hover
    (hover pct commands exactly weight)."""
    inertia = jnp.asarray(cfg.inertia, jnp.float32)
    torque = inertia * rate_p * (jnp.asarray(rate_sp) - st.omega)
    fz = jnp.clip(thrust_pct, 0.0, 1.0) \
        * (cfg.mass * cfg.gravity / hover_thrust)
    fz = jnp.clip(fz, 0.0, cfg.max_force)
    # FD bookkeeping as in the acc branch
    acc_world = (st.vel - st.prev_vel) / dt
    R = _quat_to_mat(st.quat)
    body_acc = R.T @ acc_world
    pos, vel, quat, omega = _integrate(cfg, st, fz, torque, dt)
    return st._replace(pos=pos, vel=vel, quat=quat, omega=omega,
                       prev_vel=st.vel, prev_body_acc=body_acc)

"""Quadrotor rigid-body plant (models/quad_plant.py): the Gazebo
quadcopterPlugin acc-control mode (quadcopterPlugin.cpp UpdateDynamics,
pidController.cpp) as arrays, plus the engine's plant="quadrotor" path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intent_mpc_tpu.models.quad_plant import (
    PIDParams, QuadPlantConfig, pid_init, pid_update, quad_init, quad_step,
    quat_to_euler)


def _fly(state, acc_fn, yaw_fn, n, dt=0.01):
    cfg = QuadPlantConfig()

    def step(st, k):
        st = quad_step(cfg, st, acc_fn(k), yaw_fn(k), dt)
        return st, st.pos

    return jax.lax.scan(step, state, jnp.arange(n))


def test_hover_equilibrium():
    """Zero acceleration command from level hover: thrust balances
    gravity, drone stays put (plugin load_factor*g feed-forward)."""
    st = quad_init((1.0, 2.0, 3.0))
    st, path = jax.jit(lambda s: _fly(s, lambda k: jnp.zeros(3),
                                      lambda k: 0.0, 200))(st)
    drift = float(jnp.linalg.norm(st.pos - jnp.array([1.0, 2.0, 3.0])))
    assert drift < 0.05, drift
    assert float(jnp.linalg.norm(st.vel)) < 0.05


def test_acc_command_tracking():
    """A constant world +x acceleration command pitches the drone forward
    (positive pitch in the plugin's sign convention: pitch_command =
    +PID_accXY(des.x)/g) and accelerates it along +x."""
    st = quad_init((0.0, 0.0, 2.0))
    cmd = jnp.array([1.0, 0.0, 0.0])
    st, _ = jax.jit(lambda s: _fly(s, lambda k: cmd, lambda k: 0.0, 300))(st)
    # after 3 s at ~1 m/s^2 the drone is moving +x at roughly 3 m/s
    assert 1.5 < float(st.vel[0]) < 4.5, st.vel
    assert abs(float(st.vel[1])) < 0.3
    _, pitch, _ = quat_to_euler(st.quat)
    assert float(pitch) > 0.005  # tilted into the motion


def test_yaw_angle_tracking():
    """yawAngle P-controller -> yaw-rate PID -> z-torque converges the
    heading, including across the wrap."""
    st = quad_init((0.0, 0.0, 2.0), yaw=-3.0)
    target = 3.0  # shortest path crosses the +-pi wrap
    st, _ = jax.jit(lambda s: _fly(s, lambda k: jnp.zeros(3),
                                   lambda k: target, 400))(st)
    _, _, yaw = quat_to_euler(st.quat)
    err = float(jnp.arctan2(jnp.sin(yaw - target), jnp.cos(yaw - target)))
    assert abs(err) < 0.05, err


def test_pid_limit_and_filter():
    """PID setpoint clamp (pidController.cpp:48) and the tc=0 identity
    dinput == 0 (the filtered input equals the new input)."""
    par = PIDParams(p=2.0, d=1.0, limit=0.5)
    out, st = pid_update(par, pid_init(), 3.0, 0.0, 0.0, 0.01)
    # input clamped to 0.5 -> p-term 2*0.5; d-term = (dinput - dx) = 0
    assert np.isclose(float(out), 1.0, atol=1e-6)
    assert np.isclose(float(st.dinput), 0.0, atol=1e-6)
    # time-constant filter: input moves only partway toward the setpoint
    par2 = PIDParams(p=1.0, time_constant=0.09)
    _, st2 = pid_update(par2, pid_init(), 1.0, 0.0, 0.0, 0.01)
    assert 0.05 < float(st2.input) < 0.2


@pytest.mark.slow
def test_engine_quadrotor_plant_reaches_goal():
    """EngineConfig.plant='quadrotor': the full MPC loop closed through
    the rigid-body plant still flies the clear corridor to the goal."""
    from intent_mpc_tpu.utils.config import small_config
    from intent_mpc_tpu.models.world import (generate_scenario,
                                             straight_line_ref_traj)
    from intent_mpc_tpu.engine.closed_loop import run_episode, summarize

    cfg = small_config(num_obstacles=6, horizon=10, timeout=6.0,
                       max_obstacles=6, hist=12)
    cfg = cfg.replace(goal=(8.0, 0.0, 2.0))
    cfg = cfg.replace(engine=dataclasses.replace(cfg.engine,
                                                 plant="quadrotor"))
    sc = generate_scenario(seed=1, cfg=cfg.world)
    sc = sc._replace(origin=sc.origin + jnp.array([0.0, 30.0, 0.0]))
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=0.5)
    carry, _ = run_episode(cfg, sc, ref, jnp.asarray(ref.shape[0]),
                           solver_iters=60)
    s = summarize(cfg, carry)
    assert s["goal_reached"], s
    assert not s["collision"], s
    # attitude state actually moved (the plant was in the loop)
    assert float(jnp.abs(carry.quad.quat[2])) > 1e-5  # pitched en route


@pytest.mark.slow
def test_attitude_bodyrate_modes_close_the_loop():
    """The controller's attitude + body-rate output chain
    (acc PID -> acc_to_attitude -> body_rate_command) flies the
    rigid body to a position step, and the hover-thrust Kalman filter
    calibrates toward the plant's true hover fraction
    (trackingController.cpp:279-370, :500-550)."""
    from intent_mpc_tpu.models import controller as ct
    from intent_mpc_tpu.models.quad_plant import quad_step_bodyrate

    cfg = QuadPlantConfig()
    true_hover = 0.62          # plant thrust calibration
    est = ct.init_thrust_estimator(0.7)
    cst = ct.init_controller()
    st = quad_init((0.0, 0.0, 2.0))
    target = jnp.array([1.0, -0.5, 2.5])
    dt = 0.01
    from intent_mpc_tpu.utils.config import ControlConfig
    ccfg = ControlConfig()
    prev_vel = st.vel
    for k in range(1000):
        acc_cmd, cst = ct.acc_command(ccfg, cst, st.pos, st.vel, target,
                                      jnp.zeros(3), jnp.zeros(3), dt)
        acc_ref = acc_cmd + jnp.array([0.0, 0.0, ct.GRAVITY])
        q_ref = ct.acc_to_attitude(acc_ref, jnp.zeros(()))
        cmd = ct.body_rate_command(st.quat, q_ref, acc_ref,
                                   float(est.hover_thrust))
        prev_vel = st.vel
        st = quad_step_bodyrate(cfg, st, cmd[0:3], cmd[3],
                                true_hover, dt)
        if k % 5 == 0 and k > 0:
            # accelerometer-convention measurement: kinematic a_z + g
            az = float((st.vel - prev_vel)[2] / dt) + ct.GRAVITY
            est = ct.thrust_estimate_step(est, cmd[3], az)
    err = float(jnp.linalg.norm(st.pos - target))
    assert err < 0.25, (np.asarray(st.pos), err)
    assert float(jnp.linalg.norm(st.vel)) < 0.3
    # estimator moved toward the plant's true hover fraction
    assert abs(float(est.hover_thrust) - true_hover) < \
        abs(0.7 - true_hover), float(est.hover_thrust)

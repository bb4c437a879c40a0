"""TOPP time-optimizer tests + controller mode tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.models import time_optimizer as topp
from intent_mpc_tpu.models import controller as ctl


def test_straight_line_respects_limits_and_is_fast():
    n = 120
    xs = np.linspace(0, 20, n)
    path = jnp.asarray(np.stack([xs, np.zeros(n), np.zeros(n)], -1))
    res = topp.parameterize(path, v_max=4.0, a_max=2.0)
    b = np.asarray(res.b)
    assert (np.sqrt(b) <= 4.0 + 1e-3).all()
    # triangle/trapezoid profile time for 20m, v4, a2: t = 2*2 + (20-16)/4 = 6
    assert 5.5 < float(res.total_time) < 7.5
    # accelerations along the path within limits
    t = np.asarray(res.times)
    v = np.sqrt(b)
    a = np.diff(v) / np.maximum(np.diff(t), 1e-9)
    assert np.abs(a).max() < 2.0 + 0.2


def test_curve_slows_down():
    n = 200
    th = np.linspace(0, np.pi, n)
    r = 1.0
    curve = np.stack([r * np.cos(th), r * np.sin(th), np.zeros(n)], -1)
    path = jnp.asarray(curve)
    res = topp.parameterize(path, v_max=5.0, a_max=2.0)
    # centripetal limit: v^2 / r <= a_max -> v <= sqrt(2)
    v_mid = float(np.sqrt(np.asarray(res.b)[n // 2]))
    assert v_mid <= np.sqrt(2.0) + 0.2


def test_sample_state_endpoints():
    n = 50
    xs = np.linspace(0, 5, n)
    path = jnp.asarray(np.stack([xs, np.zeros(n), np.ones(n)], -1))
    res = topp.parameterize(path, v_max=2.0, a_max=1.0)
    p0, v0 = topp.sample_state(path, res, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(p0), [0, 0, 1], atol=1e-5)
    pe, ve = topp.sample_state(path, res, res.total_time + 1.0)
    np.testing.assert_allclose(np.asarray(pe), [5, 0, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ve), 0.0, atol=1e-6)


def test_attitude_from_hover_acc():
    q = ctl.acc_to_attitude(jnp.array([0.0, 0.0, 9.8]), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-5)
    # lean forward (+x accel) -> pitch
    q2 = np.asarray(ctl.acc_to_attitude(jnp.array([3.0, 0.0, 9.8]),
                                        jnp.asarray(0.0)))
    assert abs(q2[2]) > 0.05   # pitch quaternion component


def test_body_rate_zero_at_reference():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    cmd = np.asarray(ctl.body_rate_command(q, q, jnp.array([0, 0, 9.8]),
                                           hover_thrust=0.7))
    np.testing.assert_allclose(cmd[:3], 0.0, atol=1e-6)
    np.testing.assert_allclose(cmd[3], 0.7, atol=1e-3)


def test_thrust_estimator_converges():
    est = ctl.init_thrust_estimator(hover_thrust=0.5)
    true_h = 0.7
    for _ in range(500):
        cmd = 0.65
        acc_z = (cmd / true_h) * 9.8   # physics: a_z = cmd/h * g
        est = ctl.thrust_estimate_step(est, jnp.asarray(cmd),
                                       jnp.asarray(acc_z))
    assert abs(float(est.hover_thrust) - true_h) < 0.05

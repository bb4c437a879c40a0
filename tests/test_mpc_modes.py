"""MPC planner mode tests: FOV half-spaces and the non-predictor path."""

import numpy as np
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.utils.config import PlannerConfig, SolverConfig
from intent_mpc_tpu.models import mpc as mpclib
from intent_mpc_tpu.models.predictor import Prediction


@pytest.fixture(scope="module")
def cfg():
    return PlannerConfig(horizon=10,
                         solver=SolverConfig(max_iter=200))


def _ref(cfg):
    H = 60
    xs = np.linspace(0, 30, H)
    return jnp.asarray(np.stack([xs, np.zeros(H), np.full(H, 2.0)], -1))


def test_fov_halfspaces_formula():
    hmax, hmin = mpclib.fov_halfspaces(jnp.array([1.0, 2.0, 2.0]),
                                       jnp.asarray(0.0))
    a1, b1, c1 = np.asarray(hmax)
    # maxAngle = -43.5 deg: a = sin, b = -cos
    np.testing.assert_allclose(a1, np.sin(-43.5 * np.pi / 180), atol=1e-5)
    np.testing.assert_allclose(b1, -np.cos(-43.5 * np.pi / 180), atol=1e-5)
    np.testing.assert_allclose(c1, a1 * 1.0 + b1 * 2.0, atol=1e-5)


def test_make_plan_nonpred_solves_and_warm_starts(cfg):
    ref = _ref(cfg)
    st = mpclib.init_planner_state(cfg)
    pos = jnp.array([0.0, 0.0, 2.0])
    vel = jnp.array([1.0, 0.0, 0.0])
    obs_pos = jnp.array([[6.0, 2.5, 2.0], [12.0, -2.5, 2.0]])
    obs_vel = jnp.zeros((2, 3))
    obs_size = jnp.full((2, 3), 1.0)
    vis = jnp.ones(2, bool)
    out = mpclib.make_plan(cfg, st, pos, vel, ref,
                           jnp.asarray(ref.shape[0]), obs_pos, obs_vel,
                           obs_size, vis)
    assert bool(out.valid)
    # first solve has no obstacle rows (firstTime); second does
    out2 = mpclib.make_plan(cfg, out.state, pos, vel, ref,
                            jnp.asarray(ref.shape[0]), obs_pos, obs_vel,
                            obs_size, vis)
    assert bool(out2.valid)
    assert float(out2.prim_res[0]) < 1.0
    x = np.asarray(out2.state.states_sol)
    assert np.all(np.abs(x[:, 3:6]) <= cfg.max_vel + 0.3)


def test_fov_rows_constrain_behind(cfg):
    """With FOV half-spaces at yaw=0, horizon states must stay inside the
    forward wedge (no planning behind the camera)."""
    ref = _ref(cfg)
    st = mpclib.init_planner_state(cfg)
    pos = jnp.array([0.0, 0.0, 2.0])
    vel = jnp.array([1.0, 0.0, 0.0])
    O = 2
    P1 = cfg.horizon + 1
    pred = Prediction(
        pos=jnp.broadcast_to(jnp.array([50.0, 0.0, 2.0]), (O, 4, P1, 3)),
        size=jnp.broadcast_to(jnp.ones(3), (O, 4, P1, 3)),
        intent_prob=jnp.full((O, 4), 0.25))
    vis = jnp.zeros(O, bool)
    out = mpclib.make_plan_with_pred(
        cfg, st, pos, vel, ref, jnp.asarray(ref.shape[0]), pred, vis,
        curr_yaw=jnp.asarray(0.0))
    assert bool(out.valid)
    out2 = mpclib.make_plan_with_pred(
        cfg, out.state, pos, vel, ref, jnp.asarray(ref.shape[0]), pred, vis,
        curr_yaw=jnp.asarray(0.0))
    x = np.asarray(out2.state.states_sol)
    # inside the wedge: |y| <= tan(43.5deg) * x (+ margin for solver slack)
    ok = np.abs(x[1:, 1]) <= np.tan(43.5 * np.pi / 180) * np.maximum(
        x[1:, 0], 0.0) + 0.2
    assert ok.all(), x[:, :2]


def test_make_plan_with_static_obstacles(cfg):
    """Static obstacles (from clustering) use the static safety distance,
    static slack column and yaw-rotated ellipsoids."""
    ref = _ref(cfg)
    st = mpclib.init_planner_state(cfg)
    pos = jnp.array([0.0, 0.0, 2.0])
    vel = jnp.array([1.0, 0.0, 0.0])
    obs_pos = jnp.zeros((1, 3)).at[0].set(jnp.array([50.0, 0.0, 2.0]))
    obs_vel = jnp.zeros((1, 3))
    obs_size = jnp.ones((1, 3))
    vis = jnp.zeros(1, bool)
    static = (jnp.array([[5.0, 1.5, 2.0]]), jnp.array([[1.0, 2.0, 3.0]]),
              jnp.array([0.5]), jnp.array([True]))
    out = mpclib.make_plan(cfg, st, pos, vel, ref,
                           jnp.asarray(ref.shape[0]), obs_pos, obs_vel,
                           obs_size, vis, static_obs=static)
    assert bool(out.valid)
    out2 = mpclib.make_plan(cfg, out.state, pos, vel, ref,
                            jnp.asarray(ref.shape[0]), obs_pos, obs_vel,
                            obs_size, vis, static_obs=static)
    assert bool(out2.valid)
    assert np.isfinite(np.asarray(out2.state.states_sol)).all()


def test_drift_aware_factor_refresh(cfg):
    """SolverConfig.factor_drift_refresh: on a reuse cycle (cycle_idx %
    k != 0), a tiny threshold forces a refactor — the result must equal
    the refresh-cycle computation bit-for-bit — while a huge threshold
    reuses the carried factor (VERDICT r4 item 6)."""
    import dataclasses
    import jax

    def build(drift):
        sv = dataclasses.replace(cfg.solver, factor_reuse_cycles=4,
                                 factor_drift_refresh=drift)
        return dataclasses.replace(cfg, max_obstacles=2, solver=sv)

    ref = _ref(cfg)
    pos = jnp.array([0.0, 0.0, 2.0])
    vel = jnp.array([1.0, 0.0, 0.0])
    pred = Prediction(
        pos=jnp.broadcast_to(jnp.array([6.0, 0.5, 2.0]),
                             (2, 4, cfg.horizon + 1, 3)),
        size=jnp.ones((2, 4, cfg.horizon + 1, 3)),
        intent_prob=jnp.full((2, 4), 0.25))
    vis = jnp.ones(2, bool)

    def fly(drift, cycle):
        c = build(drift)
        st = mpclib.init_planner_state(c)
        out0 = mpclib.make_plan_with_pred(c, st, pos, vel, ref,
                                          jnp.asarray(ref.shape[0]), pred,
                                          vis, 40,
                                          cycle_idx=jnp.asarray(0))
        return mpclib.make_plan_with_pred(c, out0.state, pos, vel, ref,
                                          jnp.asarray(ref.shape[0]), pred,
                                          vis, 40,
                                          cycle_idx=jnp.asarray(cycle))

    # reuse cycle, tiny threshold -> forced refresh == refresh cycle
    forced = fly(1e-9, 1)
    refresh = fly(1e9, 4)        # cycle 4 % 4 == 0: counter refresh
    np.testing.assert_array_equal(np.asarray(forced.state.states_sol),
                                  np.asarray(refresh.state.states_sol))
    # huge threshold on a reuse cycle -> carried factor (differs from the
    # forced-refresh result because the cycle-0 scaling is reused)
    reused = fly(1e9, 1)
    assert np.abs(np.asarray(reused.state.states_sol)
                  - np.asarray(forced.state.states_sol)).max() > 0

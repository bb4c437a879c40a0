"""Closed-loop engine smoke + behavior tests (tiny config, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.utils.config import small_config
from intent_mpc_tpu.models.world import generate_scenario, straight_line_ref_traj
from intent_mpc_tpu.engine.closed_loop import run_episode, summarize
import dataclasses


@pytest.fixture(scope="module")
def setup():
    cfg = small_config(num_obstacles=6, horizon=10, timeout=3.0,
                       max_obstacles=6, hist=12)
    cfg = cfg.replace(goal=(8.0, 0.0, 2.0))
    sc = generate_scenario(seed=1, cfg=cfg.world)
    # park obstacles away from the corridor so the path is clear
    sc = sc._replace(origin=sc.origin + jnp.array([0.0, 30.0, 0.0]))
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=0.5)
    return cfg, sc, ref


def test_episode_reaches_goal_clear_path(setup):
    cfg, sc, ref = setup
    carry, _ = run_episode(cfg, sc, ref, jnp.asarray(ref.shape[0]),
                           solver_iters=60)
    s = summarize(cfg, carry)
    assert s["goal_reached"], s
    assert not s["collision"], s
    assert s["path_length"] > 7.0
    assert s["mpc_solve_successes"] > 0
    assert s["max_velocity"] <= cfg.engine.vel_limit + 0.2


def test_episode_is_deterministic(setup):
    cfg, sc, ref = setup
    c1, _ = run_episode(cfg, sc, ref, jnp.asarray(ref.shape[0]), solver_iters=40,
                        num_cycles=8)
    c2, _ = run_episode(cfg, sc, ref, jnp.asarray(ref.shape[0]), solver_iters=40,
                        num_cycles=8)
    np.testing.assert_array_equal(np.asarray(c1.pos), np.asarray(c2.pos))
    np.testing.assert_array_equal(np.asarray(c1.metrics.path_length),
                                  np.asarray(c2.metrics.path_length))


def test_episode_batched_vmap(setup):
    cfg, sc, ref = setup
    scb = jax.tree.map(lambda a: jnp.stack([a, a]), sc)
    run = jax.vmap(lambda s: run_episode(cfg, s, ref,
                                         jnp.asarray(ref.shape[0]),
                                         solver_iters=40, num_cycles=6)[0])
    carry = run(scb)
    assert carry.pos.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(carry.pos[0]),
                               np.asarray(carry.pos[1]), atol=1e-5)


def test_obstacle_in_path_is_avoided(setup):
    """Plant a static obstacle near the straight line (slightly off-axis —
    an exactly-on-axis obstacle is a degenerate symmetric case where the
    linearized ellipsoid gradient has no lateral component and the
    reference formulation can only brake). The drone must clear it."""
    cfg, sc, ref = setup
    origin = np.asarray(sc.origin).copy()
    origin[0] = [4.0, 0.4, 2.0]
    sc2 = sc._replace(origin=jnp.asarray(origin),
                      is_static=sc.is_static.at[0].set(True),
                      scale=sc.scale.at[0].set(0.0))
    carry, path = run_episode(cfg, sc2, ref, jnp.asarray(ref.shape[0]),
                              solver_iters=80, record_path=True)
    s = summarize(cfg, carry)
    assert s["min_distance_to_obstacles"] < 5.0   # it did meet the obstacle
    assert not s["collision"], s
    # it deviated laterally to avoid
    assert float(np.abs(np.asarray(path)[:, 1]).max()) > 0.2


def test_nonpredictor_engine_mode(setup):
    """use_predictor=False: constant-obstacle MPC still reaches the goal."""
    import dataclasses
    cfg, sc, ref = setup
    cfg2 = cfg.replace(engine=dataclasses.replace(cfg.engine,
                                                  use_predictor=False))
    carry, _ = run_episode(cfg2, sc, ref, jnp.asarray(ref.shape[0]),
                           solver_iters=60)
    s = summarize(cfg2, carry)
    assert s["goal_reached"], s
    assert not s["collision"], s


def test_repeat_path_re_tracks(setup):
    """execute_path_times=2 with a loop path (the reference's circular-demo
    use case: the path's last waypoint is near its first): after closing
    the loop once, the planner resets and re-tracks instead of stopping."""
    import dataclasses
    cfg, sc, _ = setup
    # out-and-back loop: (0,0,2) -> (6,0,2) -> (0,0,2)
    out = np.asarray(straight_line_ref_traj((0, 0, 2), (6, 0, 2), 0.5))
    back = np.asarray(straight_line_ref_traj((6, 0, 2), (0, 0, 2), 0.5))
    loop = jnp.asarray(np.concatenate([out, back[1:]]))
    cfg2 = cfg.replace(goal=(0.0, 0.0, 2.0),
                       engine=dataclasses.replace(
                           cfg.engine, repeat_path=2, timeout=12.0))
    carry, path = run_episode(cfg2, sc, loop, jnp.asarray(loop.shape[0]),
                              solver_iters=60, record_path=True)
    p = np.asarray(path)
    # the drone flies out at least twice (two loop rounds)
    far = p[:, 0] > 3.0
    runs = np.diff(far.astype(int))
    num_excursions = int((runs == 1).sum())
    assert num_excursions >= 2, p[:, 0].round(1)
    assert int(carry.repeats_left) == 1


def test_solver_failure_holds_position(setup):
    """Failure fallback (mpcNavigation.cpp:350-364 semantics): when no
    solve is ever accepted (reference trajectory poisoned with NaN ->
    every candidate rejected), the drone must hold its start position and
    report zero successful solves — no NaN leaks into the plant state."""
    cfg, sc, ref = setup
    bad_ref = jnp.full_like(ref, jnp.nan)
    carry, _ = run_episode(cfg, sc, bad_ref, jnp.asarray(ref.shape[0]),
                           solver_iters=20)
    s = summarize(cfg, carry)
    assert s["mpc_solve_successes"] == 0
    assert not s["goal_reached"]
    pos = np.asarray(carry.pos)
    assert np.isfinite(pos).all()
    np.testing.assert_allclose(pos, np.asarray(cfg.start), atol=0.1)


def test_shared_factor_episode_matches_baseline(setup):
    """The shared-factor default (one factorization per scenario-cycle)
    must fly the same scenario to the goal without collisions and land
    within tolerance of the per-candidate-factorization trajectory
    (cfg2 = the disabled variant)."""
    cfg, sc, ref = setup
    solver2 = dataclasses.replace(cfg.planner.solver, shared_factor=False)
    cfg2 = cfg.replace(planner=dataclasses.replace(cfg.planner,
                                                   solver=solver2))
    c2, p2 = run_episode(cfg2, sc, ref, jnp.asarray(ref.shape[0]),
                         solver_iters=60, record_path=True)
    s2 = summarize(cfg2, c2)
    assert s2["goal_reached"], s2
    assert not s2["collision"], s2
    c1, p1 = run_episode(cfg, sc, ref, jnp.asarray(ref.shape[0]),
                         solver_iters=60, record_path=True)
    d = np.abs(np.asarray(p1) - np.asarray(p2)).max()
    assert d < 0.5, d   # same flight corridor, iterate-level differences


def test_fov_mode_flies_with_heading_state(setup):
    """use_fov=True: the engine carries a yaw state following the
    trajectory heading and feeds the camera-wedge half-space rows; the
    clear-corridor episode must still reach the goal (flying forward
    keeps the wedge satisfied) with a forward-facing final heading."""
    cfg, sc, ref = setup
    cfg2 = cfg.replace(engine=dataclasses.replace(cfg.engine, use_fov=True))
    carry, _ = run_episode(cfg2, sc, ref, jnp.asarray(ref.shape[0]),
                           solver_iters=60)
    s = summarize(cfg2, carry)
    assert s["goal_reached"], s
    assert not s["collision"], s
    # heading locked onto the +x corridor direction while moving
    assert abs(float(carry.yaw)) < 0.8, float(carry.yaw)


def test_episode_with_polish(setup):
    """Engine wiring of the chosen-candidate polish (solver.polish=True):
    the episode still reaches the goal with no collision, and the
    executed trajectory stays close to the unpolished run on a clear
    path (polish refines the same optimum; it must not change behavior)."""
    cfg, sc, ref = setup
    pcfg = dataclasses.replace(
        cfg.planner, solver=dataclasses.replace(cfg.planner.solver,
                                                polish=True))
    cfg_p = cfg.replace(planner=pcfg)
    carry, _ = run_episode(cfg_p, sc, ref, jnp.asarray(ref.shape[0]),
                           solver_iters=60)
    s = summarize(cfg_p, carry)
    assert s["goal_reached"], s
    assert not s["collision"], s
    carry0, _ = run_episode(cfg, sc, ref, jnp.asarray(ref.shape[0]),
                            solver_iters=60)
    s0 = summarize(cfg, carry0)
    assert abs(s["path_length"] - s0["path_length"]) < 0.2, (s, s0)

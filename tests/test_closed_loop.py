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


# ---------------------------------------------------------------------------
# Replan-check collision monitor + goal-mode navigation (round-3 parity:
# mpcNavigation.cpp replanCheckCB :414-422 predefined / :460-494 goal mode)
# ---------------------------------------------------------------------------

def _wall_occ():
    """Static wall crossing the corridor at x ~ 5.5 (only in the occupancy
    map — invisible to the MPC's dynamic-obstacle constraints, so the
    committed trajectory runs through it and the monitor must react)."""
    from intent_mpc_tpu.models.occupancy import build_from_static_obstacles
    return build_from_static_obstacles(
        origin=(-2.0, -6.0, 0.0), size_m=(14.0, 12.0, 5.0), resolution=0.1,
        centers=[[5.5, 0.0, 2.0]], bboxes=[[0.6, 10.0, 4.0]],
        inflation=np.array([0.3, 0.3, 0.3]))


def test_committed_collision_windows():
    """Unit semantics of the monitor (mpcHasCollision :631-656 /
    hasDynamicCollision :669-700): static window [min(1,elapsed), +2 s],
    dynamic window +1 s, both clamped to the horizon end."""
    from intent_mpc_tpu.engine.closed_loop import committed_collision
    from intent_mpc_tpu.models.mpc import init_planner_state
    from intent_mpc_tpu.models.occupancy import (build_from_static_obstacles,
                                                 empty_grid)
    cfg = small_config(horizon=10)
    p = cfg.planner
    # committed solution: straight +x at 5 m/s from the origin
    tgrid = np.arange(p.horizon) * p.ts
    states = np.zeros((p.horizon, 8), np.float32)
    states[:, 0] = 5.0 * tgrid
    states[:, 3] = 5.0
    ps = init_planner_state(p)._replace(states_sol=jnp.asarray(states))
    far = jnp.zeros((1, 3)) + 100.0
    none = jnp.zeros((1, 3)) + 1.0
    vis = jnp.asarray([True])
    occ0 = empty_grid()

    def occ_at(x):
        return build_from_static_obstacles(
            origin=(-1, -2, 0), size_m=(10, 4, 4), resolution=0.1,
            centers=[[x, 0.0, 0.0]], bboxes=[[0.4, 1.0, 1.0]],
            inflation=np.zeros(3))

    el = jnp.asarray(0.1)
    # wall at x=4.0 (reached at t=0.8, inside the static window) -> hit
    assert bool(committed_collision(cfg, ps, occ_at(4.0), el, far, none, vis))
    # wall beyond the horizon end (traj tops out at x=4.5) -> clean
    assert not bool(committed_collision(cfg, ps, occ_at(6.0), el, far, none,
                                        vis))
    # dynamic obstacle box sitting on the trajectory at t~0.6 -> hit
    ob = jnp.asarray([[3.0, 0.0, 0.0]])
    sz = jnp.asarray([[0.6, 0.6, 0.6]])
    assert bool(committed_collision(cfg, ps, occ0, el, ob, sz, vis))
    # same box but invisible to the detector -> clean
    assert not bool(committed_collision(cfg, ps, occ0, el, ob, sz,
                                        jnp.asarray([False])))
    # elapsed beyond 1 s clamps the window start: a box the traj only
    # touches before t=1 is no longer checked
    ob_early = jnp.asarray([[1.0, 0.0, 0.0]])
    assert bool(committed_collision(cfg, ps, occ0, jnp.asarray(0.05),
                                    ob_early, sz, vis))
    assert not bool(committed_collision(cfg, ps, occ0, jnp.asarray(2.0),
                                        ob_early, sz, vis))


def test_replan_monitor_counts_in_predefined_mode(setup):
    """Predefined-goal mode (:414-422): collision in the committed
    trajectory is flagged and replanned-while-executing — flight
    continues (the wall exists only in the static map, which the DYNUS
    benchmark MPC does not constrain against, so the monitor must fire
    while the drone flies on)."""
    cfg, sc, ref = setup
    carry, _ = run_episode(cfg, sc, ref, jnp.asarray(ref.shape[0]),
                           occ=_wall_occ(), solver_iters=60)
    s = summarize(cfg, carry)
    assert s["traj_collision_cycles"] > 0, s
    assert s["stop_replans"] == 0, s          # never stops in this mode
    assert s["goal_reached"], s               # keeps executing


def test_goal_mode_stops_and_replans_on_committed_collision(setup):
    """Goal mode (:474-480): collision in the committed trajectory ->
    stop() + discard + replan from hover. With a map-only wall the
    stop+replan cycle repeats and the drone must NOT cross the wall."""
    cfg, sc, ref = setup
    cfg2 = cfg.replace(engine=dataclasses.replace(
        cfg.engine, goal_mode=True, timeout=3.0))
    carry, _ = run_episode(cfg2, sc, ref, jnp.asarray(ref.shape[0]),
                           occ=_wall_occ(), solver_iters=60)
    s = summarize(cfg2, carry)
    assert s["stop_replans"] >= 2, s
    assert not s["goal_reached"], s
    # the stop+replan loop must keep it on the near side of the wall
    # (inflated wall front face at x = 4.9)
    assert float(carry.pos[0]) < 4.9, np.asarray(carry.pos)
    # and on a clear map the same goal-mode config flies to the goal
    # (longer timeout: the 0.3 m goal stop triggers at speed, and the
    # hold-position pull-back needs time to settle inside the monitor's
    # 0.5 m / 0.1 m/s criterion — same physics as the reference's stop())
    cfg3 = cfg.replace(engine=dataclasses.replace(
        cfg.engine, goal_mode=True, timeout=6.0))
    carry2, _ = run_episode(cfg3, sc, ref, jnp.asarray(ref.shape[0]),
                            solver_iters=60)
    s2 = summarize(cfg3, carry2)
    assert s2["goal_reached"] and s2["stop_replans"] == 0, s2


def test_goal_mode_invalid_goal_stops(setup):
    """Goal mode goalHasCollision (:460-471, :612-629): a statically
    occupied goal region invalidates the goal — the drone stops instead
    of flying."""
    from intent_mpc_tpu.models.occupancy import build_from_static_obstacles
    cfg, sc, ref = setup
    occ = build_from_static_obstacles(
        origin=(-2.0, -6.0, 0.0), size_m=(14.0, 12.0, 5.0), resolution=0.1,
        centers=[list(cfg.goal)], bboxes=[[1.0, 1.0, 1.0]],
        inflation=np.zeros(3))
    cfg2 = cfg.replace(engine=dataclasses.replace(cfg.engine,
                                                  goal_mode=True))
    carry, _ = run_episode(cfg2, sc, ref, jnp.asarray(ref.shape[0]),
                           occ=occ, solver_iters=60)
    s = summarize(cfg2, carry)
    assert not s["goal_reached"], s
    assert s["path_length"] < 0.5, s


def test_lookahead_yaw_semantics():
    """trajExeCB :536-553: yaw points at the first stored-reference point
    >= 1 m from getRef(t); holds when no point is far enough."""
    from intent_mpc_tpu.engine.closed_loop import _lookahead_yaw
    from intent_mpc_tpu.models.mpc import init_planner_state
    cfg = small_config(horizon=10)
    p = cfg.planner
    # L-shaped reference: 0.6 m along +x, then up +y
    pts = np.zeros((p.horizon, 3), np.float32)
    xs = [0.0, 0.3, 0.6]
    for i in range(p.horizon):
        if i < 3:
            pts[i] = [xs[i], 0.0, 2.0]
        else:
            pts[i] = [0.6, 0.3 * (i - 2), 2.0]
    ps = init_planner_state(p)._replace(xref=jnp.asarray(pts))
    ok = jnp.asarray(True)
    yaw = _lookahead_yaw(cfg, ps, jnp.asarray(0.0), jnp.asarray(0.0), ok)
    # first point >= 1 m from (0,0): (0.6, 0.9) -> atan2(0.9, 0.6)
    np.testing.assert_allclose(float(yaw), np.arctan2(0.9, 0.6), atol=1e-5)
    # instantaneous velocity heading would be 0 (+x) — the look-ahead
    # must differ (this is the FOV-geometry-relevant deviation)
    assert abs(float(yaw)) > 0.5
    # all-near reference: hold the current yaw
    near = np.zeros((p.horizon, 3), np.float32) + np.array([0.1, 0.0, 2.0],
                                                           np.float32)
    ps2 = init_planner_state(p)._replace(xref=jnp.asarray(near))
    yaw2 = _lookahead_yaw(cfg, ps2, jnp.asarray(0.0), jnp.asarray(0.7), ok)
    np.testing.assert_allclose(float(yaw2), 0.7)

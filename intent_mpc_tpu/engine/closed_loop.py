"""Closed-loop simulation engine: world -> detector -> predictor -> MPC ->
controller -> dynamics, as one jitted lax.scan per episode.

Replaces the reference's multi-process ROS loop (mpcNavigation timers
:176-188, tracking_controller 100 Hz cmdCB, dynus obstacle publisher,
run_mpc_benchmark.py monitor) with a deterministic two-level loop:

  outer scan: 10 Hz MPC cycles (mpcCB, mpcNavigation.cpp:222-370)
  inner unrolled 10 ticks: 100 Hz trajectory execution (trajExeCB :499-567),
    PID tracking control (acceleration mode), double-integrator dynamics,
    ~30 Hz detector history pushes (ticks 0/3/6), and the benchmark
    monitor's per-sample metric updates (run_mpc_benchmark.py:224-385).

Episodes vmap over scenarios; the candidate axis batches inside the MPC.
Timing deviations from the ROS reference (wall-clock, jittered) are
deterministic here: the predictor runs at MPC time (its 30 Hz timer output
was consumed at 10 Hz anyway), and the target stream is sampled at 100 Hz
(the reference publishes at 200 Hz from a 100 Hz-updated buffer).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from intent_mpc_tpu.models import detector as det
from intent_mpc_tpu.models import real_detector as rdet
from intent_mpc_tpu.models import mpc as mpclib
from intent_mpc_tpu.models import predictor as predlib
from intent_mpc_tpu.models.controller import (ControllerState, acc_command,
                                              init_controller)
from intent_mpc_tpu.models.quad_plant import (QuadPlantConfig, QuadState,
                                              quad_init, quad_step)
from intent_mpc_tpu.models.occupancy import (OccupancyGrid, empty_grid,
                                             is_occupied)
from intent_mpc_tpu.models.world import Scenario, obstacle_state
from intent_mpc_tpu.engine.ref_builder import build_goal_ref
from intent_mpc_tpu.utils.config import IntentMPCConfig


class Metrics(NamedTuple):
    goal_reached: jnp.ndarray
    travel_time: jnp.ndarray
    collision: jnp.ndarray
    collision_count: jnp.ndarray
    min_obstacle_dist: jnp.ndarray
    path_length: jnp.ndarray
    vel_violations: jnp.ndarray
    acc_violations: jnp.ndarray
    jerk_violations: jnp.ndarray
    samples: jnp.ndarray
    jerk_samples: jnp.ndarray
    max_velocity: jnp.ndarray
    max_acceleration: jnp.ndarray
    sum_velocity: jnp.ndarray
    n_vel_valid: jnp.ndarray
    jerk_sq_sum: jnp.ndarray
    jerk_abs_sum: jnp.ndarray
    solve_attempts: jnp.ndarray
    solve_successes: jnp.ndarray
    prim_res_sum: jnp.ndarray     # accumulated chosen-candidate residuals
    prim_res_max: jnp.ndarray
    traj_collision_cycles: jnp.ndarray  # replanCheckCB monitor hits
    stop_replans: jnp.ndarray     # goal-mode stop+replan events (:474-480)


def init_metrics() -> Metrics:
    z = jnp.zeros((), jnp.float32)
    zi = jnp.zeros((), jnp.int32)
    return Metrics(
        goal_reached=jnp.asarray(False), travel_time=z,
        collision=jnp.asarray(False), collision_count=zi,
        min_obstacle_dist=jnp.asarray(jnp.inf, jnp.float32), path_length=z,
        vel_violations=zi, acc_violations=zi, jerk_violations=zi,
        samples=zi, jerk_samples=zi,
        max_velocity=z, max_acceleration=z, sum_velocity=z, n_vel_valid=zi,
        jerk_sq_sum=z, jerk_abs_sum=z,
        solve_attempts=zi, solve_successes=zi,
        prim_res_sum=z, prim_res_max=z,
        traj_collision_cycles=zi, stop_replans=zi)


class EngineCarry(NamedTuple):
    pos: jnp.ndarray
    vel: jnp.ndarray
    detector: det.DetectorState
    planner: mpclib.PlannerState
    controller: ControllerState
    traj_age: jnp.ndarray        # cycles since the executing solution's start
    traj_ready: jnp.ndarray      # bool (mpcTrajectoryReady_)
    prev_target_acc: jnp.ndarray
    has_prev_target: jnp.ndarray
    stopping: jnp.ndarray        # replanCheck goal-stop triggered
    stop_pos: jnp.ndarray
    repeats_left: jnp.ndarray    # int32 path repetitions remaining
    tracking_start: jnp.ndarray  # time the current tracking round began
    yaw: jnp.ndarray             # heading (reference look-ahead yaw,
                                 # trajExeCB :536-553; feeds FOV rows)
    ref_anchor: jnp.ndarray      # (3,) goal-mode reference start: reset to
                                 # the stop position on stop+replan (the
                                 # reference rebuilds its input traj from
                                 # current odom -> goal, mpcCB :268-288);
                                 # unused in predefined-goal mode
    quad: QuadState              # rigid-body plant state (used when
                                 # EngineConfig.plant == "quadrotor";
                                 # pos/vel mirror it then)
    done: jnp.ndarray            # monitor goal criterion met
    metrics: Metrics
    # goal-mode composed-reference state (ref_mode "minsnap"/"global" only;
    # None otherwise so the default carry stays lean). The reference builds
    # its MPC input trajectory once per refTrajReady_=false pass
    # (mpcNavigation.cpp:239-290) and keeps it until the next stop+replan.
    ref_traj: Optional[jnp.ndarray] = None   # (L, 3) committed input traj
    ref_len: Optional[jnp.ndarray] = None    # int32 valid waypoints
    need_ref: Optional[jnp.ndarray] = None   # bool (refTrajReady_ == false)
    # real-perception mode (use_fake_detector=False): the depth-camera
    # track table + per-track history rings (models/real_detector.py);
    # None on the GT path so the default carry stays lean
    real_det: Optional[rdet.RealDetectorState] = None
    # goal-approach relaxation (EngineConfig.goal_relax, opt-in
    # beyond-reference): consecutive stalled-near-goal cycle counter
    # driving the dynamic-safety anneal; None when the feature is off so
    # the default program is unchanged
    stall_cycles: Optional[jnp.ndarray] = None


def init_carry(cfg: IntentMPCConfig, scenario: Scenario,
               ref_len: Optional[int] = None) -> EngineCarry:
    pos0, _ = obstacle_state(scenario, jnp.asarray(0.0))
    start = jnp.asarray(cfg.start, jnp.float32)
    composed = cfg.engine.goal_mode and cfg.engine.ref_mode != "linspace"
    if composed and ref_len is None:
        raise ValueError("goal mode with ref_mode %r needs init_carry's "
                         "ref_len (the input-trajectory array length)"
                         % cfg.engine.ref_mode)
    return EngineCarry(
        ref_traj=jnp.zeros((ref_len, 3), jnp.float32) if composed else None,
        ref_len=jnp.asarray(2, jnp.int32) if composed else None,
        need_ref=jnp.asarray(True) if composed else None,
        real_det=None if cfg.engine.use_fake_detector else
        rdet.init_real_detector(cfg.real_detector, cfg.detector),
        stall_cycles=(jnp.asarray(0, jnp.int32) if cfg.engine.goal_relax
                      else None),
        pos=start, vel=jnp.zeros(3, jnp.float32),
        detector=det.init_detector(scenario.origin.shape[0], cfg.detector, pos0),
        planner=mpclib.init_planner_state(cfg.planner),
        controller=init_controller(),
        traj_age=jnp.asarray(0, jnp.int32),
        traj_ready=jnp.asarray(False),
        prev_target_acc=jnp.zeros(3, jnp.float32),
        has_prev_target=jnp.asarray(False),
        stopping=jnp.asarray(False),
        stop_pos=start,
        repeats_left=jnp.asarray(cfg.engine.repeat_path, jnp.int32),
        tracking_start=jnp.zeros((), jnp.float32),
        yaw=jnp.zeros((), jnp.float32),
        ref_anchor=start,
        quad=quad_init(start),
        done=jnp.asarray(False),
        metrics=init_metrics())


def _aabb_distance(p: jnp.ndarray, centers: jnp.ndarray,
                   bbox: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance from point to each box surface (0 inside) —
    run_mpc_benchmark.py:352-381 check_collisions."""
    gap = jnp.maximum(jnp.abs(p[None, :] - centers) - bbox / 2.0, 0.0)
    return jnp.linalg.norm(gap, axis=-1)


def committed_collision(cfg: IntentMPCConfig, planner: mpclib.PlannerState,
                        occ: OccupancyGrid, elapsed: jnp.ndarray,
                        obs_pos: jnp.ndarray, obs_size: jnp.ndarray,
                        visible: jnp.ndarray) -> jnp.ndarray:
    """replanCheckCB's committed-trajectory monitor.

    mpcHasCollision (mpcNavigation.cpp:631-656): sample the EXECUTING
    solution at ts steps from startTime = min(1, elapsed) to
    min(startTime + 2, horizon*ts) and test the static inflated map.
    hasDynamicCollision (:669-700): same sweep over a 1 s window, AABB
    membership against the detector's current (robot-size-inflated,
    range-filtered) obstacle boxes. Either -> collision flagged."""
    p = cfg.planner
    ts = p.ts
    t_start = jnp.minimum(1.0, elapsed)
    t_end = p.horizon * ts
    tj = t_start + ts * jnp.arange(p.horizon + 1, dtype=jnp.float32)
    pj = jax.vmap(lambda t: mpclib.sample_pos(p, planner.states_sol, t))(tj)
    static_m = tj <= jnp.minimum(t_start + 2.0, t_end)
    dyn_m = tj <= jnp.minimum(t_start + 1.0, t_end)
    occ_hit = jax.vmap(lambda q: is_occupied(occ, q))(pj)
    static_hit = jnp.any(occ_hit & static_m)
    lo = obs_pos - obs_size / 2.0
    hi = obs_pos + obs_size / 2.0
    inside = jnp.all((pj[:, None, :] >= lo[None]) &
                     (pj[:, None, :] <= hi[None]), axis=-1)
    dyn_hit = jnp.any(inside & visible[None, :] & dyn_m[:, None])
    return static_hit | dyn_hit


def goal_region_occupied(occ: OccupancyGrid, goal: jnp.ndarray) -> jnp.ndarray:
    """goalHasCollision (mpcNavigation.cpp:612-629): dense +-0.5 m grid at
    0.1 m steps around the goal against the static inflated map."""
    off = jnp.arange(-0.5, 0.5 + 1e-6, 0.1, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(off, off, off, indexing="ij")
    pts = goal[None, :] + jnp.stack(
        [gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)
    return jnp.any(jax.vmap(lambda q: is_occupied(occ, q))(pts))


def _lookahead_yaw(cfg: IntentMPCConfig, planner: mpclib.PlannerState,
                   t_traj: jnp.ndarray, cur_yaw: jnp.ndarray,
                   update_ok: jnp.ndarray) -> jnp.ndarray:
    """trajExeCB yaw smoothing (mpcNavigation.cpp:536-553): target yaw
    points at the first stored-reference point >= yaw_lookahead metres
    from getRef(t); if no such point within the horizon, hold yaw."""
    p = cfg.planner
    dist = cfg.engine.yaw_lookahead
    ref0 = mpclib.sample_ref(p, planner.xref, t_traj)
    tj = t_traj + p.ts * jnp.arange(p.horizon + 1, dtype=jnp.float32)
    pj = jax.vmap(lambda t: mpclib.sample_ref(p, planner.xref, t))(tj)
    far = (jnp.linalg.norm(pj - ref0[None, :], axis=-1) >= dist) \
        & (tj <= p.horizon * p.ts)
    j = jnp.argmax(far)                      # first True
    tgt = pj[j]
    yaw_new = jnp.arctan2(tgt[1] - ref0[1], tgt[0] - ref0[0])
    return jnp.where(update_ok & jnp.any(far), yaw_new, cur_yaw)


def episode_step(cfg: IntentMPCConfig, scenario: Scenario,
                 ref_traj: jnp.ndarray, traj_len: jnp.ndarray,
                 occ: OccupancyGrid, carry: EngineCarry, cycle_idx: jnp.ndarray,
                 solver_iters: Optional[int] = None,
                 solve_override=None,
                 ref_key: Optional[jnp.ndarray] = None,
                 veto_occ: Optional[OccupancyGrid] = None
                 ) -> Tuple[EngineCarry, jnp.ndarray]:
    """One 10 Hz MPC cycle + its 10 control ticks.

    solve_override: optional `(qps, warm6) -> ADMMResult` replacing the
    batched ADMM inside make_plan_with_pred (oracle-in-the-loop runs).
    ref_key: PRNG key for the goal-mode RRT route (ref_mode "global").
    veto_occ: static grid for the real-detector classification veto
    (RealDetectorConfig.static_map_veto). Pass the UN-inflated static
    volume: vetoing against the robot-inflated planning grid masked a
    dynamic obstacle skimming a pillar and caused the one measured veto
    collision (seed 21, results/real_dynus28_veto) — a dynamic
    obstacle's center essentially never enters SOLID static geometry.
    Defaults to `occ` (the planning grid) when the flag is on and no
    dedicated grid is given."""
    ecfg = cfg.engine
    cycle_dt = ecfg.control_dt * ecfg.ticks_per_cycle
    t0 = cycle_idx.astype(jnp.float32) * cycle_dt
    goal = jnp.asarray(cfg.goal)
    active = ~carry.done

    # ---- detector updates at cycle start ----
    obs_pos0, _ = obstacle_state(scenario, t0)
    obs_all = jnp.ones(obs_pos0.shape[0], bool)
    if ecfg.use_fake_detector:
        d = det.fd_update(cfg.detector, carry.detector, obs_pos0, t0)
        d = det.hist_push(d, obs_pos0)
        rd = carry.real_det
        # predictor_stale_hist: the predictor/MPC consume the history as
        # of the previous cycle's last 30 Hz tick (the reference's
        # 30 Hz-predictor-timer staleness bound); default = fresh push
        d_query = carry.detector if ecfg.predictor_stale_hist else d
        pos_h, vel_h, acc_h, size_h, hist_len, visible = det.query_history(
            cfg.detector, d_query, scenario.bbox, carry.pos)
    else:
        # real perception (use_fake_detector=false, mpcNavigation.cpp:
        # 129-136): render a depth frame at the drone's pose, run the
        # detect/track/classify stack, and query TRACK histories — the
        # GT obstacle boxes below are only the scene the camera images
        d = carry.detector
        cam_occ = occ if ecfg.render_static_grid else None
        if not cfg.real_detector.static_map_veto:
            veto_occ = None
        elif veto_occ is None:
            veto_occ = occ
        rd = rdet.sense_and_track(cfg.real_detector, cfg.detector,
                                  carry.real_det, carry.pos, carry.yaw,
                                  obs_pos0, scenario.bbox, obs_all, cam_occ,
                                  obs_dynamic=~scenario.is_static,
                                  static_occ=veto_occ)
        pos_h, vel_h, acc_h, size_h, hist_len, visible = rdet.query_history(
            cfg.real_detector, cfg.detector, rd, carry.pos,
            static_occ=veto_occ)

    # ---- replan-check collision monitor (replanCheckCB :414-422, :460-480) ----
    false = jnp.asarray(False)
    if ecfg.replan_check:
        elapsed = (carry.traj_age.astype(jnp.float32) + 1.0) * cycle_dt
        traj_hit = carry.traj_ready & active & committed_collision(
            cfg, carry.planner, occ, elapsed, pos_h[:, 0], size_h[:, 0],
            visible)
    else:
        traj_hit = false
    if ecfg.goal_mode:
        # goal mode: collision in the committed trajectory -> stop(),
        # discard it, replan from hover (:474-480); statically-occupied
        # goal region -> invalid goal, permanent stop (:460-471)
        stop_replan = traj_hit
        goal_invalid = active & goal_region_occupied(occ, goal)
    else:
        # predefined-goal mode: log + replan while executing (:414-422) —
        # the engine already replans every cycle, so the monitor's effect
        # is the observable counter only
        stop_replan = false
        goal_invalid = false

    planner_in = jax.tree.map(
        lambda fresh, cur: jnp.where(stop_replan, fresh, cur),
        mpclib.init_planner_state(cfg.planner), carry.planner)
    ref_anchor = jnp.where(stop_replan, carry.pos, carry.ref_anchor)
    build_cycle = jnp.asarray(False)
    if ecfg.goal_mode and ecfg.ref_mode == "linspace":
        # round-3 behavior: straight-segment input trajectory rebuilt from
        # the anchor every cycle (valid only over an empty corridor — the
        # reference never feeds the MPC a raw line, see ref_builder)
        L = ref_traj.shape[0]
        ref_traj = jnp.linspace(ref_anchor, goal, L)
        traj_len = jnp.asarray(L)
    elif ecfg.goal_mode:
        # composed input trajectory (mpcNavigation.cpp:239-290): on a
        # refTrajReady_=false pass, [RRT ->] corridor-constrained min-snap
        # from current odom -> goal, sampled at 0.1 s; the build pass does
        # NOT solve the MPC (the reference's if/else on refTrajReady_) and
        # the trajectory is kept until the next stop+replan
        # stop pass -> build pass -> solve pass, like the reference's
        # refTrajReady_ handshake (stop() clears it; the next mpcCB pass
        # only builds; the pass after solves)
        L = ref_traj.shape[0]
        build_cycle = carry.need_ref & ~stop_replan & active
        if ref_key is None:
            ref_key = jax.random.PRNGKey(0)

        def _build(_):
            k = jax.random.fold_in(ref_key, cycle_idx)
            r, n, _, route_ok = build_goal_ref(ecfg, occ, carry.pos, goal,
                                               k, L, dt=cfg.planner.ts)
            return r, n, route_ok

        ref_new, len_new, route_ok = jax.lax.cond(
            build_cycle, _build,
            lambda _: (carry.ref_traj, carry.ref_len, jnp.asarray(True)),
            None)
        # a build with no RRT route is not committed: the engine holds and
        # retries next cycle with a fresh fold of the key (the reference
        # keeps replanning at its mpcCB cadence until RRT succeeds)
        build_committed = build_cycle & route_ok
        ref_traj = jnp.where(build_committed, ref_new, carry.ref_traj)
        traj_len = jnp.where(build_committed, len_new, carry.ref_len)
        # updatePath resets the planner warm state (mpcFirstTime_)
        planner_in = jax.tree.map(
            lambda fresh, cur: jnp.where(build_committed, fresh, cur),
            mpclib.init_planner_state(cfg.planner), planner_in)

    # ---- local static clustering (getStaticObstacles; the real-
    # perception composition: statics reach the MPC via the static map ->
    # obstacleClustering -> rotated-box rows instead of the fake
    # detector, mpcPlanner.cpp:191-193 + updateObstacleParam :1186-1195)
    static_obs = None
    if cfg.planner.static_clustering:
        from intent_mpc_tpu.models import clustering as clus
        from intent_mpc_tpu.models.occupancy import local_occupied_points
        pts, pvalid = local_occupied_points(
            occ, carry.pos, cfg.planner.cluster_window,
            cfg.planner.cluster_points)
        ccfg = clus.ClusteringConfig(max_clusters=4, tree_level=2,
                                     min_pts=8)
        so = clus.cluster_obstacles(ccfg, pts, pvalid)
        assert so.centroid.shape[0] == cfg.planner.cluster_slots
        static_obs = (so.centroid, so.size, so.yaw, so.active)

    # ---- goal-approach safety relaxation (opt-in, beyond-reference;
    # see EngineConfig.goal_relax) ----
    dyn_safety = None
    stall_new = carry.stall_cycles
    if ecfg.goal_relax:
        dist_goal = jnp.linalg.norm(carry.pos - goal)
        speed = jnp.linalg.norm(carry.vel)
        stalled = active & (dist_goal < ecfg.goal_relax_radius) \
            & (dist_goal > ecfg.goal_dist_threshold) \
            & (speed < ecfg.goal_relax_speed)
        # hysteresis: decay instead of reset when the stall clears, so a
        # dart-retreat-dart cycle against a crisscrossing goal dweller
        # accumulates relaxation across attempts instead of restarting
        # the anneal from scratch each approach
        stall_new = jnp.where(stalled, carry.stall_cycles + 1,
                              jnp.maximum(carry.stall_cycles - 2, 0))
        relax = jnp.clip(
            (stall_new - ecfg.goal_relax_grace).astype(jnp.float32)
            * ecfg.goal_relax_rate,
            0.0, cfg.planner.dynamic_safety_dist - ecfg.goal_relax_floor)
        dyn_safety = cfg.planner.dynamic_safety_dist - relax

    # ---- predictor + MPC (mpcCB :290-365) ----
    if ecfg.use_predictor:
        prediction = predlib.predict(cfg.predictor, pos_h, vel_h, acc_h,
                                     size_h, hist_len, occ)
        plan_out = mpclib.make_plan_with_pred(
            cfg.planner, planner_in, carry.pos, carry.vel, ref_traj,
            traj_len, prediction, visible, solver_iters,
            curr_yaw=carry.yaw if ecfg.use_fov else None,
            solve_override=solve_override, cycle_idx=cycle_idx,
            static_obs=static_obs, dyn_safety=dyn_safety)
    else:
        # use_predictor=false: obstacles held constant over the horizon
        # (mpcNavigation.cpp:301-311 + updateDynamicObstacles)
        plan_out = mpclib.make_plan(
            cfg.planner, planner_in, carry.pos, carry.vel, ref_traj,
            traj_len, pos_h[:, 0], vel_h[:, 0], size_h[:, 0], visible,
            solver_iters, static_obs=static_obs, dyn_safety=dyn_safety)

    # stop_replan / goal_invalid cycles hold position and do not commit a
    # plan (the reference's stop() + mpcTrajectoryReady_=false; the replan
    # resumes next cycle from the reset warm state)
    run_mpc = active & ~carry.stopping & ~stop_replan & ~goal_invalid \
        & ~build_cycle
    planner = jax.tree.map(
        lambda new, old: jnp.where(run_mpc, new, old),
        plan_out.state, planner_in)
    valid = plan_out.valid & run_mpc
    traj_ready = (carry.traj_ready & ~stop_replan) | valid
    traj_age = jnp.where(valid, 0, carry.traj_age + 1)

    if ecfg.goal_mode and ecfg.replan_check:
        # goal mode also vets the FRESHLY committed plan: the reference's
        # 100 Hz replanCheckCB fires within 10 ms of a commit, so a plan
        # that already collides is stopped before it meaningfully
        # executes (:474-480). Without this the engine's 10 Hz check
        # granularity would let a doomed plan fly a full cycle.
        post_hit = valid & committed_collision(
            cfg, planner, occ, jnp.asarray(ecfg.control_dt), pos_h[:, 0],
            size_h[:, 0], visible)
        planner = jax.tree.map(
            lambda fresh, cur: jnp.where(post_hit, fresh, cur),
            mpclib.init_planner_state(cfg.planner), planner)
        traj_ready = traj_ready & ~post_hit
        stop_replan = stop_replan | post_hit
        traj_hit = traj_hit | post_hit

    best_prim = plan_out.prim_res[plan_out.best_idx]
    metrics = carry.metrics._replace(
        solve_attempts=carry.metrics.solve_attempts + run_mpc.astype(jnp.int32),
        solve_successes=carry.metrics.solve_successes + valid.astype(jnp.int32),
        prim_res_sum=carry.metrics.prim_res_sum
        + jnp.where(run_mpc, best_prim, 0.0),
        prim_res_max=jnp.where(
            run_mpc, jnp.maximum(carry.metrics.prim_res_max, best_prim),
            carry.metrics.prim_res_max),
        traj_collision_cycles=carry.metrics.traj_collision_cycles
        + traj_hit.astype(jnp.int32),
        stop_replans=carry.metrics.stop_replans
        + stop_replan.astype(jnp.int32))

    # ---- goal-stop / repeat trigger (replanCheckCB :414-456) ----
    near_goal = jnp.linalg.norm(carry.pos - goal) <= ecfg.goal_stop_threshold
    if not ecfg.goal_mode:
        # predefined-goal mode gates the stop on 3 s of tracking (:423);
        # goal mode stops on distance alone (:482-494)
        near_goal = near_goal & (t0 - carry.tracking_start >= 3.0)
    do_repeat = near_goal & active & (carry.repeats_left > 1)
    stopping = carry.stopping | (near_goal & active & (carry.repeats_left <= 1)) \
        | goal_invalid
    stop_pos = jnp.where(carry.stopping, carry.stop_pos, carry.pos)
    repeats_left = jnp.where(do_repeat, carry.repeats_left - 1,
                             carry.repeats_left)
    tracking_start = jnp.where(do_repeat, t0, carry.tracking_start)
    # repeat: re-track the same path (updatePath resets planner state)
    planner = jax.tree.map(
        lambda fresh, cur: jnp.where(do_repeat, fresh, cur),
        mpclib.init_planner_state(cfg.planner), planner)
    traj_ready = traj_ready & ~do_repeat

    pos, vel = carry.pos, carry.vel
    quad = carry.quad
    ctrl = carry.controller
    prev_acc = carry.prev_target_acc
    has_prev = carry.has_prev_target
    yaw = carry.yaw
    done = carry.done

    H = cfg.planner.horizon
    end_time = H * cfg.planner.ts

    for k in range(ecfg.ticks_per_cycle):
        tk = t0 + k * ecfg.control_dt
        t_traj = traj_age.astype(jnp.float32) * cycle_dt + k * ecfg.control_dt

        # ---- target from trajectory (trajExeCB :499-567) ----
        tp = mpclib.sample_pos(cfg.planner, planner.states_sol, t_traj)
        tv = mpclib.sample_vel(cfg.planner, planner.states_sol, t_traj)
        ta = mpclib.sample_acc(cfg.planner, planner.controls_sol, t_traj)
        past_end = t_traj >= end_time
        tv = jnp.where(past_end, 0.0, tv)
        ta = jnp.where(past_end, 0.0, ta)
        # stop mode or no trajectory: hold position
        hold = stopping | ~traj_ready
        hold_pos = jnp.where(stopping, stop_pos, pos)
        tp = jnp.where(hold, hold_pos, tp)
        tv = jnp.where(hold, 0.0, tv)
        ta = jnp.where(hold, 0.0, ta)

        # ---- control + dynamics ----
        acc_cmd, ctrl_new = acc_command(cfg.control, ctrl, pos, vel, tp, tv,
                                        ta, ecfg.control_dt)
        ctrl = jax.tree.map(lambda n, o: jnp.where(active, n, o), ctrl_new, ctrl)
        if ecfg.perfect_tracking:
            new_pos, new_vel = tp, tv
        elif ecfg.plant == "quadrotor":
            # rigid-body plant (quadcopterPlugin acc-control mode): the
            # controller's world-acc command + trajectory heading drive
            # the PID->force/torque cascade
            quad_new = quad_step(QuadPlantConfig(), quad, acc_cmd, yaw,
                                 ecfg.control_dt)
            quad = jax.tree.map(lambda n, o: jnp.where(active, n, o),
                                quad_new, quad)
            new_pos, new_vel = quad.pos, quad.vel
        else:
            new_vel = vel + acc_cmd * ecfg.control_dt
            new_pos = pos + vel * ecfg.control_dt \
                + 0.5 * acc_cmd * ecfg.control_dt ** 2
        step_len = jnp.linalg.norm(new_pos - pos)
        pos = jnp.where(active, new_pos, pos)
        vel = jnp.where(active, new_vel, vel)

        # ---- world state at this tick ----
        obs_pos_t, _ = obstacle_state(scenario, tk + ecfg.control_dt)
        # ~30 Hz history pushes; tick 0's push is the cycle-start push above
        if k in ecfg.hist_ticks and k != 0:
            if ecfg.use_fake_detector:
                d2 = det.fd_update(cfg.detector, d, obs_pos_t,
                                   tk + ecfg.control_dt)
                d = det.hist_push(d2, obs_pos_t)
            else:
                rd = rdet.sense_and_track(cfg.real_detector, cfg.detector,
                                          rd, pos, yaw, obs_pos_t,
                                          scenario.bbox, obs_all, cam_occ,
                                          obs_dynamic=~scenario.is_static,
                                          static_occ=veto_occ)

        # ---- monitor updates (masked once done) ----
        m = metrics
        dist_boxes = _aabb_distance(pos, obs_pos_t, scenario.bbox)
        min_d = jnp.min(dist_boxes)
        hit = jnp.any(dist_boxes <= 0.0)
        tol = ecfg.violation_tol
        v_viol = jnp.any(jnp.abs(tv) > ecfg.vel_limit + tol)
        a_viol = jnp.any(jnp.abs(ta) > ecfg.acc_limit + tol)
        jerk = (ta - prev_acc) / ecfg.control_dt
        j_viol = jnp.any(jnp.abs(jerk) > ecfg.jerk_limit + tol) & has_prev
        jmag = jnp.linalg.norm(jerk)
        vmag = jnp.linalg.norm(tv)
        amag = jnp.linalg.norm(ta)

        upd = active
        ui = upd.astype(jnp.int32)
        m = m._replace(
            min_obstacle_dist=jnp.where(upd, jnp.minimum(m.min_obstacle_dist, min_d), m.min_obstacle_dist),
            collision=m.collision | (hit & upd),
            collision_count=m.collision_count + (hit & upd).astype(jnp.int32),
            path_length=m.path_length + jnp.where(upd, step_len, 0.0),
            vel_violations=m.vel_violations + (v_viol & upd).astype(jnp.int32),
            acc_violations=m.acc_violations + (a_viol & upd).astype(jnp.int32),
            jerk_violations=m.jerk_violations + (j_viol & upd).astype(jnp.int32),
            samples=m.samples + ui,
            jerk_samples=m.jerk_samples + (has_prev & upd).astype(jnp.int32),
            max_velocity=jnp.where(upd, jnp.maximum(m.max_velocity, vmag), m.max_velocity),
            max_acceleration=jnp.where(upd, jnp.maximum(m.max_acceleration, amag), m.max_acceleration),
            sum_velocity=m.sum_velocity + jnp.where(upd & (vmag > 0.01), vmag, 0.0),
            n_vel_valid=m.n_vel_valid + (upd & (vmag > 0.01)).astype(jnp.int32),
            jerk_sq_sum=m.jerk_sq_sum + jnp.where(upd & has_prev, jmag ** 2, 0.0),
            jerk_abs_sum=m.jerk_abs_sum + jnp.where(upd & has_prev, jmag, 0.0),
        )
        metrics = m
        prev_acc = jnp.where(active, ta, prev_acc)
        has_prev = has_prev | active
        if ecfg.yaw_lookahead > 0.0:
            # reference yaw semantics (trajExeCB :536-553): point at the
            # stored-reference point >= 1 m ahead; hold yaw when none or
            # when holding position (the leftTime<=0 / noYawChange paths)
            yaw = _lookahead_yaw(cfg, planner, t_traj, yaw,
                                 active & traj_ready & ~hold & ~past_end)
        else:
            # legacy velocity-heading yaw (round-2 behavior)
            speed_xy = jnp.linalg.norm(tv[0:2])
            yaw = jnp.where(active & (speed_xy > 0.1),
                            jnp.arctan2(tv[1], tv[0]), yaw)

        # goal criterion (run_mpc_benchmark.py:268-276); with repeat_path
        # (loop-path demos, where goal == path start) the trial only
        # completes once the final round's goal stop has triggered
        reached = (jnp.linalg.norm(pos - goal) < ecfg.goal_dist_threshold) \
            & (jnp.linalg.norm(vel) < ecfg.goal_vel_threshold) & active
        if ecfg.repeat_path > 1:
            reached = reached & stopping
        metrics = metrics._replace(
            goal_reached=metrics.goal_reached | reached,
            travel_time=jnp.where(reached & ~done, tk + ecfg.control_dt,
                                  metrics.travel_time))
        done = done | reached

        active = ~done

    new_carry = EngineCarry(
        pos=pos, vel=vel, detector=d, planner=planner, controller=ctrl,
        traj_age=traj_age, traj_ready=traj_ready,
        prev_target_acc=prev_acc, has_prev_target=has_prev,
        stopping=stopping, stop_pos=stop_pos, repeats_left=repeats_left,
        tracking_start=tracking_start, yaw=yaw,
        # after a stop+replan the next cycle's reference re-anchors at the
        # held position (the reference rebuilds its input traj from
        # current odom once refTrajReady_ is false, mpcCB :268-288)
        ref_anchor=jnp.where(stop_replan, pos, ref_anchor),
        quad=quad, done=done, metrics=metrics,
        # composed modes: the freshly built trajectory is committed and
        # refTrajReady_ flips true; any stop+replan this cycle (including
        # the post-commit vet) re-arms the builder for next cycle
        ref_traj=None if carry.ref_traj is None else ref_traj,
        ref_len=None if carry.ref_len is None else traj_len,
        need_ref=None if carry.need_ref is None else
        (carry.need_ref & ~build_committed) | stop_replan,
        real_det=rd, stall_cycles=stall_new)
    return new_carry, pos


def run_episode(cfg: IntentMPCConfig, scenario: Scenario,
                ref_traj: jnp.ndarray, traj_len: jnp.ndarray,
                occ: Optional[OccupancyGrid] = None,
                solver_iters: Optional[int] = None,
                num_cycles: Optional[int] = None,
                record_path: bool = False,
                solve_override=None,
                ref_key: Optional[jnp.ndarray] = None,
                chunk_cycles: Optional[int] = None,
                veto_occ: Optional[OccupancyGrid] = None):
    """Run one full episode; returns (final EngineCarry, path (C,3) or None).

    chunk_cycles: split the episode scan into <=chunk_cycles-cycle
    dispatches (in-memory carry). Heavy per-cycle program classes (the
    real-detector render/DBSCAN stack, goal-mode composition) should use
    this on the TPU tunnel — the worker's crash envelope is per
    dispatched program (harness.SAFE_* notes)."""
    occ = occ if occ is not None else empty_grid()
    n = num_cycles if num_cycles is not None else cfg.engine.num_cycles
    carry0 = init_carry(cfg, scenario, ref_len=ref_traj.shape[0])

    def step(c, i):
        c2, p = episode_step(cfg, scenario, ref_traj, traj_len, occ, c, i,
                             solver_iters, solve_override=solve_override,
                             ref_key=ref_key, veto_occ=veto_occ)
        return c2, (p if record_path else None)

    if chunk_cycles is None or chunk_cycles >= n:
        carry, path = jax.lax.scan(step, carry0, jnp.arange(n))
        return carry, path

    from functools import partial

    @partial(jax.jit, static_argnames=("m",))
    def run_chunk(c, start, m):
        return jax.lax.scan(step, c, start + jnp.arange(m))

    carry, paths = carry0, []
    start = 0
    while start < n:
        m = min(chunk_cycles, n - start)
        carry, p = run_chunk(carry, jnp.asarray(start, jnp.int32), m)
        jax.block_until_ready(carry)
        if record_path:
            paths.append(p)
        start += m
    path = jnp.concatenate(paths) if record_path else None
    return carry, path


def summarize(cfg: IntentMPCConfig, carry: EngineCarry) -> dict:
    """Host-side metric summary mirroring BenchmarkMetrics fields."""
    m = carry.metrics
    straight = float(jnp.linalg.norm(jnp.asarray(cfg.goal) - jnp.asarray(cfg.start)))
    pl = float(m.path_length)
    dt = cfg.engine.control_dt
    n_j = max(int(m.jerk_samples), 1)
    return {
        "goal_reached": bool(m.goal_reached),
        "timeout_reached": not bool(m.goal_reached),
        "collision": bool(m.collision),
        "collision_count": int(m.collision_count),
        "flight_travel_time": float(m.travel_time),
        "path_length": pl,
        "straight_line_distance": straight,
        "path_efficiency": pl / straight if straight > 0 else 0.0,
        "min_distance_to_obstacles": float(m.min_obstacle_dist),
        "vel_violation_count": int(m.vel_violations),
        "acc_violation_count": int(m.acc_violations),
        "jerk_violation_count": int(m.jerk_violations),
        "vel_total_samples": int(m.samples),
        "acc_total_samples": int(m.samples),
        "jerk_total_samples": int(m.jerk_samples),
        "max_velocity": float(m.max_velocity),
        "max_acceleration": float(m.max_acceleration),
        "avg_velocity": float(m.sum_velocity) / max(int(m.n_vel_valid), 1),
        "jerk_rms": float(jnp.sqrt(m.jerk_sq_sum / n_j)),
        "jerk_integral": float(m.jerk_abs_sum) * dt,
        "mpc_solve_count": int(m.solve_attempts),
        "mpc_solve_successes": int(m.solve_successes),
        "mpc_prim_res_avg": float(m.prim_res_sum) / max(int(m.solve_attempts), 1),
        "mpc_prim_res_max": float(m.prim_res_max),
        "traj_collision_cycles": int(m.traj_collision_cycles),
        "stop_replans": int(m.stop_replans),
    }


def perception_summary(carry: EngineCarry) -> dict:
    """Track-vs-GT perception quality of a real-detector episode
    (models/real_detector.PerceptionStats; VERDICT r4 item 2a)."""
    if carry.real_det is None:
        return {}
    s = carry.real_det.stats
    import numpy as _np
    err_n = max(int(s.err_n), 1)
    return {
        "track_pos_rmse": float(_np.sqrt(float(s.err_sq_sum) / err_n)),
        "track_matches": int(s.err_n),
        "missed_rate": float(s.missed_sum) / max(int(s.gt_in_fov_sum), 1),
        "missed_count": int(s.missed_sum),
        "gt_in_fov_ticks": int(s.gt_in_fov_sum),
        "spurious_rate": float(s.spurious_sum)
        / max(int(s.track_ticks_sum), 1),
        "spurious_count": int(s.spurious_sum),
        "dyn_track_ticks": int(s.track_ticks_sum),
        "track_births": int(s.births_sum),
    }

"""Goal-mode MPC input-trajectory builder: [RRT ->] corridor-constrained
min-snap -> dt-sampled reference.

Rebuild of the reference's goal-mode trajectory composition
(mpcNavigation.cpp:239-290): when `refTrajReady_` is false the reference
NEVER hands the MPC a raw straight line. It either

  * routes through the static map with the goal-biased RRT first
    (useGlobalPlanner_, :240-265: rrtPlanner_->makePlan -> waypoints), or
  * takes the 2-waypoint [odom, goal] path (:267-289),

then builds a corridor-constrained min-snap polynomial over those
waypoints with zero start/end vel/acc (polyTraj_->updatePath +
makePlan(), the corridor-shrink loop of polyTrajOccMap.cpp:252-335) and
samples it at dt=0.1 (getTrajectory(0.1)) as the MPC input trajectory
(mpc_->updatePath).

Array-native deviations (documented, exactness-preserving in spirit):
  * the RRT's variable-length waypoint list is resampled to a fixed
    `num_waypoints` count at uniform arc length so the min-snap QP has a
    static shape; the route geometry is preserved (the reference's
    shortcutting already reduces the path to a handful of corners).
  * the RRT sampling box is derived from the start/goal pair plus a
    margin instead of the env_box yaml (the DYNUS corridor); callers can
    widen it via EngineConfig.ref_bounds_margin.
  * on RRT failure (no route found within the iteration budget) the
    builder falls back to the straight 2-waypoint path — the reference
    keeps its previous rrtPathMsg_ and feeds the (empty) temp path to
    polyTraj, which degenerates similarly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from intent_mpc_tpu.models import poly_planner, poly_traj
from intent_mpc_tpu.models.global_planner import RRTConfig, rrt_plan
from intent_mpc_tpu.models.occupancy import OccupancyGrid


def resample_path(path: jnp.ndarray, n: jnp.ndarray, num_out: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resample a padded polyline (Lp,3) with `n` valid points to
    `num_out` points at uniform arc length. Returns (points, total_len)."""
    Lp = path.shape[0]
    seg = path[1:] - path[:-1]
    seglen = jnp.linalg.norm(seg, axis=-1)
    seglen = jnp.where(jnp.arange(Lp - 1) < n - 1, seglen, 0.0)
    cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seglen)])      # (Lp,)
    last = jnp.clip(n - 1, 0, Lp - 1)
    total = cum[last]
    s = jnp.linspace(0.0, 1.0, num_out) * total
    idx = jnp.clip(jnp.searchsorted(cum, s, side="right") - 1, 0, Lp - 2)
    frac = (s - cum[idx]) / jnp.maximum(seglen[idx], 1e-9)
    pts = path[idx] + seg[idx] * jnp.clip(frac, 0.0, 1.0)[:, None]
    pts = pts.at[0].set(path[0]).at[num_out - 1].set(path[last])
    return pts, total


def build_goal_ref(ecfg, occ: OccupancyGrid, start: jnp.ndarray,
                   goal: jnp.ndarray, key, length: int, dt: float = 0.1
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                              jnp.ndarray]:
    """Build the MPC input trajectory for goal mode.

    ecfg: EngineConfig (ref_mode "minsnap" | "global" + knobs).
    Returns (ref_traj (length,3), traj_len int32, poly_ok bool,
    route_ok bool): poly_ok = corridor-constrained polynomial found
    (False = pwl failsafe in effect, use_pwl_failsafe semantics);
    route_ok = the RRT found a route (always True outside global mode) —
    the engine retries the build next cycle when it is False."""
    start = jnp.asarray(start, jnp.float32)
    goal = jnp.asarray(goal, jnp.float32)
    route_ok = jnp.asarray(True)

    if ecfg.ref_mode == "global":
        m = ecfg.ref_bounds_margin
        lo = jnp.minimum(start, goal) - m
        hi = jnp.maximum(start, goal) + m
        lo = lo.at[2].set(jnp.maximum(lo[2], ecfg.ref_z_min))
        rrt = rrt_plan(occ, start, goal, lo, hi, key,
                       RRTConfig(max_iters=ecfg.ref_rrt_iters,
                                 incremental_dist=ecfg.ref_rrt_step,
                                 goal_reach_dist=max(0.4,
                                                     ecfg.ref_rrt_step),
                                 max_shortcut_dist=ecfg.ref_rrt_shortcut))
        # the RRT terminates at a node within goal_reach_dist; append the
        # goal itself as the final waypoint (rrtBase backtracking pushes
        # the goal onto the plan) before arc-length resampling
        Lp = rrt.path.shape[0]
        gi = jnp.clip(rrt.length, 0, Lp - 1)
        path = rrt.path.at[gi].set(goal)
        wps, _ = resample_path(path, jnp.minimum(rrt.length + 1, Lp),
                               ecfg.ref_waypoints)
        straight = jnp.linspace(start, goal, ecfg.ref_waypoints)
        wps = jnp.where(rrt.success, wps, straight)
        route_ok = rrt.success
    elif ecfg.ref_mode == "minsnap":
        wps = jnp.stack([start, goal])
    else:
        raise ValueError(f"build_goal_ref: bad ref_mode {ecfg.ref_mode!r}")

    ppcfg = poly_planner.PolyPlanConfig(
        initial_radius=ecfg.ref_corridor_radius,
        angular_vel=ecfg.ref_angular_vel,
        poly=poly_traj.PolyTrajConfig(max_iter=ecfg.ref_poly_iters))
    res = poly_planner.plan(ppcfg, wps, ecfg.ref_vel, occ)

    total_t = jnp.where(res.valid, res.traj.times[-1],
                        res.failsafe.duration)
    tt = jnp.minimum(jnp.arange(length, dtype=jnp.float32) * dt, total_t)
    ref = jax.vmap(lambda t: poly_planner.sample(res, t))(tt)
    traj_len = jnp.clip(jnp.ceil(total_t / dt).astype(jnp.int32) + 1,
                        2, length)

    # degenerate guard: already at the goal -> hold it
    # endpoint guarantee (protocol-scale fix, round 5): the reference
    # solves its per-axis min-snap QPs with CONVERGED OSQP, so its input
    # trajectory always ends exactly at the goal; our budgeted dense
    # ADMM can leave a metre-scale endpoint sag on long ill-conditioned
    # routes (measured 1.5 m on 105 m DYNUS routes at 400 iters —
    # RESULTS.md "Goal-mode composition at protocol scale"), which parks
    # the MPC outside the 0.5 m goal criterion forever. Restore the
    # converged-endpoint property by construction: walk the trailing
    # samples straight from the sampled endpoint to the goal at ref_vel.
    idx = jnp.arange(length)
    # same sag at the head: blend a linearly-decaying correction so the
    # trajectory starts exactly at the drone's position (the reference's
    # converged solve starts at odom; updatePath feeds it currPos)
    head_err = start - ref[0]
    head_gap = jnp.linalg.norm(head_err)
    n_head = jnp.clip(jnp.ceil(head_gap / jnp.maximum(ecfg.ref_vel * dt,
                                                      1e-6)
                               ).astype(jnp.int32), 1, length)
    decay = jnp.clip(1.0 - idx / n_head, 0.0, 1.0)
    ref = jnp.where(head_gap > 0.05, ref + decay[:, None] * head_err, ref)

    end = ref[jnp.clip(traj_len - 1, 0, length - 1)]
    gap = jnp.linalg.norm(goal - end)
    n_tail = jnp.clip(jnp.ceil(gap / jnp.maximum(ecfg.ref_vel * dt, 1e-6)
                               ).astype(jnp.int32), 1, length)
    frac = jnp.clip((idx - (traj_len - 1)) / n_tail, 0.0, 1.0)
    need_tail = gap > 0.05
    ref = jnp.where(need_tail & (idx >= traj_len - 1)[:, None],
                    end + frac[:, None] * (goal - end), ref)
    traj_len = jnp.where(need_tail,
                         jnp.minimum(traj_len + n_tail, length), traj_len)

    tiny = jnp.linalg.norm(goal - start) < 0.05
    ref = jnp.where(tiny, jnp.broadcast_to(goal, ref.shape), ref)
    traj_len = jnp.where(tiny, 2, traj_len)
    return (ref.astype(jnp.float32), traj_len, res.valid | tiny,
            route_ok | tiny)

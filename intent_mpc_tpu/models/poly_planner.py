"""Occupancy-aware min-snap planning loop with corridor shrink + pwl failsafe.

Rebuild of trajPlanner::polyTrajOccMap (trajectory_planner/polyTrajOccMap.cpp
:252-335): iteratively solve the corridor-constrained min-snap QP, check
the sampled trajectory against the occupancy map, shrink the corridor of
colliding segments by `shrinking_factor` (adjustCorridorSize :565-569),
and fall back to the piecewise-linear trajectory when no collision-free
polynomial is found within `max_iterations`.

The reference's wall-clock timeout becomes the fixed iteration budget
(`maximum_iteration_num`, planner_param.yaml: 10); the loop is a lax.scan
whose carry keeps the best-so-far trajectory, so batches of planning
problems vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from intent_mpc_tpu.models import poly_traj, pwl_traj
from intent_mpc_tpu.models.global_planner import occupied_at
from intent_mpc_tpu.models.occupancy import OccupancyGrid


class PolyPlanConfig(NamedTuple):
    initial_radius: float = 0.5      # poly_traj/initial_radius
    shrinking_factor: float = 0.5    # poly_traj/shrinking_factor
    max_iterations: int = 10         # poly_traj/maximum_iteration_num
    sample_dt: float = 0.1           # poly_traj/sample_delta_time
    samples_per_check: int = 10      # collision samples per segment
    angular_vel: float = 1.0         # pwl-failsafe desired_angular_vel
                                     # (the rotate-in-place hold rate)
    poly: poly_traj.PolyTrajConfig = poly_traj.PolyTrajConfig()


class PolyPlanResult(NamedTuple):
    traj: poly_traj.PolyTrajectory
    valid: jnp.ndarray               # bool: collision-free polynomial found
    used_failsafe: jnp.ndarray       # bool
    failsafe: pwl_traj.PWLTrajectory


def _segment_collisions(cfg: PolyPlanConfig, tr: poly_traj.PolyTrajectory,
                        occ: OccupancyGrid) -> jnp.ndarray:
    """Per-segment collision flags from sampled positions
    (checkCollisionTraj semantics). Returns (nseg,) bool."""
    nseg = tr.coeffs.shape[0]
    S = cfg.samples_per_check

    def seg_hit(i):
        t0, t1 = tr.times[i], tr.times[i + 1]
        fr = (jnp.arange(S) + 0.5) / S
        ts = t0 + (t1 - t0) * fr
        pts = jax.vmap(lambda t: poly_traj.sample(tr, t))(ts)
        # occupied_at dispatch: the corridor planner runs over either the
        # unified grid (polyTrajOccMap) or the octo backend
        # (polyTrajOctomap's role, rrt-style)
        return jnp.any(occupied_at(occ, pts))

    return jax.vmap(seg_hit)(jnp.arange(nseg))


def plan(cfg: PolyPlanConfig, waypoints: jnp.ndarray, desired_vel: float,
         occ: OccupancyGrid,
         init_vel=None, init_acc=None) -> PolyPlanResult:
    """Corridor-shrink planning loop over a fixed iteration budget."""
    nseg = waypoints.shape[0] - 1
    r0 = jnp.full(nseg, cfg.initial_radius)

    def solve(r):
        return poly_traj.plan(waypoints, desired_vel, cfg.poly,
                              corridor_r=r, init_vel=init_vel,
                              init_acc=init_acc)

    def step(carry, _):
        r, best, have_valid = carry
        tr = solve(r)
        hits = _segment_collisions(cfg, tr, occ)
        valid = ~jnp.any(hits)
        # keep the first valid trajectory (reference exits the loop)
        best = jax.tree.map(
            lambda new, old: jnp.where(valid & ~have_valid, new, old),
            tr, best)
        r_next = jnp.where(hits, r * cfg.shrinking_factor, r)
        return (r_next, best, have_valid | valid), None

    first = solve(r0)
    hits0 = _segment_collisions(cfg, first, occ)
    valid0 = ~jnp.any(hits0)
    r1 = jnp.where(hits0, r0 * cfg.shrinking_factor, r0)
    (_, best, have_valid), _ = jax.lax.scan(
        step, (r1, first, valid0), None, length=cfg.max_iterations - 1)

    failsafe = pwl_traj.plan(waypoints, desired_vel,
                             desired_angular_vel=cfg.angular_vel)
    return PolyPlanResult(traj=best, valid=have_valid,
                          used_failsafe=~have_valid, failsafe=failsafe)


def sample(res: PolyPlanResult, t, order: int = 0) -> jnp.ndarray:
    """Sample the plan: polynomial when valid, pwl failsafe position
    otherwise (use_pwl_failsafe semantics; failsafe has no acc)."""
    p_poly = poly_traj.sample(res.traj, t, order=order)
    if order == 0:
        p_pwl, _ = pwl_traj.sample(res.failsafe, t)
    else:
        p_pwl = jnp.zeros(3)
    return jnp.where(res.valid, p_poly, p_pwl)

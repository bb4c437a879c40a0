"""Piecewise-linear trajectory: constant-velocity waypoint interpolation
with rotate-then-translate time allocation.

Rebuild of trajPlanner::pwlTraj (trajectory_planner/piecewiseLinearTraj.cpp).
Semantics: each waypoint gets a yaw facing the next waypoint; the time line
alternates rotation segments (yaw interpolated at desired angular velocity,
position held at the segment's TARGET waypoint, :219-250) and forward
segments (linear position interpolation at desired velocity, yaw held).
The first segment has zero rotation time (:223-232 avgTimeAllocation).

Array-native: the plan is (knot_times, poses, yaws) fixed-shape arrays;
sampling is a vectorized searchsorted + masked interpolation, usable inside
jit/vmap. Waypoint counts are static; pad with repeated last waypoints
(zero-length segments behave like the reference's <1e-3 guard).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PWLTrajectory(NamedTuple):
    waypoints: jnp.ndarray   # (N, 3)
    yaws: jnp.ndarray        # (N,)  facing yaw per waypoint
    knots: jnp.ndarray       # (2*(N-1),) cumulative segment end times
    duration: jnp.ndarray    # scalar


def _yaw_diff_dir(y0, y1):
    """Shortest rotation magnitude + direction (getPose :225-243)."""
    diff = y1 - y0
    absd = jnp.abs(diff)
    over = absd > jnp.pi
    mag = jnp.where(over, 2 * jnp.pi - absd, absd)
    direction = jnp.where(over, -jnp.sign(diff), jnp.sign(diff))
    direction = jnp.where(direction == 0, 1.0, direction)
    return mag, direction


def plan(waypoints: jnp.ndarray, desired_vel: float,
         desired_angular_vel: float) -> PWLTrajectory:
    """avgTimeAllocation (piecewiseLinearTraj.cpp:85-121, useYaw=False)."""
    n = waypoints.shape[0]
    seg = waypoints[1:] - waypoints[:-1]                    # (N-1, 3)
    yaw_seg = jnp.arctan2(seg[:, 1], seg[:, 0])
    yaws = jnp.concatenate([yaw_seg, yaw_seg[-1:]])

    dist = jnp.linalg.norm(seg, axis=-1)
    fwd_t = dist / desired_vel
    rot_mag, _ = _yaw_diff_dir(yaws[:-1], jnp.roll(yaws, -1)[:-1])
    # rotation before segment i uses yaw change from segment i-1 to i;
    # first segment has no rotation
    prev_mag, _ = _yaw_diff_dir(jnp.concatenate([yaws[:1], yaws[:-2]]),
                                yaws[:-1])
    rot_t = prev_mag / desired_angular_vel
    rot_t = rot_t.at[0].set(0.0)

    # interleave [rot_0, fwd_0, rot_1, fwd_1, ...] cumulative
    durs = jnp.stack([rot_t, fwd_t], axis=-1).reshape(-1)   # (2*(N-1),)
    knots = jnp.cumsum(durs)
    return PWLTrajectory(waypoints=waypoints, yaws=yaws, knots=knots,
                         duration=knots[-1])


def sample(traj: PWLTrajectory, t) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Position + yaw at time t (getPose :201-278), end-clamped."""
    knots = traj.knots
    starts = jnp.concatenate([jnp.zeros(1), knots[:-1]])
    i = jnp.clip(jnp.searchsorted(knots, t, side="left"), 0, knots.shape[0] - 1)
    seg_idx = i // 2
    is_rot = (i % 2) == 0          # even interleaved slots are rotations
    t0 = starts[i]
    t1 = knots[i]
    frac = jnp.where(t1 - t0 < 1e-3, 0.0,
                     jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0))

    p_curr = traj.waypoints[seg_idx]
    p_next = traj.waypoints[jnp.minimum(seg_idx + 1, traj.waypoints.shape[0] - 1)]
    y_prev = traj.yaws[jnp.maximum(seg_idx - 1, 0)]
    y_curr = traj.yaws[seg_idx]

    # rotation period: hold the segment's start position, slerp yaw
    mag, direction = _yaw_diff_dir(y_prev, y_curr)
    rot_pos = p_curr
    rot_yaw = y_prev + direction * frac * mag
    # forward period: lerp position, hold yaw
    fwd_pos = p_curr + frac * (p_next - p_curr)

    past_end = t >= traj.duration
    pos = jnp.where(past_end, traj.waypoints[-1],
                    jnp.where(is_rot, rot_pos, fwd_pos))
    yaw = jnp.where(past_end, traj.yaws[-1],
                    jnp.where(is_rot, rot_yaw, y_curr))
    return pos, yaw


def discretize(traj: PWLTrajectory, dt: float, n_steps: int) -> jnp.ndarray:
    """makePlan (:163-177): sample every dt from 0 (fixed n_steps, clamped
    at the end — callers size n_steps >= duration/dt + 1)."""
    ts = jnp.arange(n_steps) * dt
    import jax
    pos, _ = jax.vmap(lambda t: sample(traj, t))(ts)
    return pos

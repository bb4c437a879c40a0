"""Gradient-based uniform B-spline trajectory optimization.

Rebuild of trajectory_planner/bsplineTraj (bsplineTraj.cpp + vendored
lbfgs.hpp): a uniform cubic B-spline whose control points are optimized
with smoothness, collision, dynamic-obstacle and feasibility terms. The
reference couples a hand-written L-BFGS with ESDF-free guide-point
gradients from A* paths; here the same cost structure runs under jax.grad
with an optax L-BFGS/Adam loop — autodiff replaces the hand-derived
gradients, the occupancy ESDF (models/mapping.esdf) replaces guide-point
casting, and whole batches of trajectories optimize simultaneously.

Cost terms (bsplineTraj.cpp solver cost assembly):
  * smoothness: squared 3rd-order control-point differences (jerk)
  * static collision: penalty below a clearance threshold of the ESDF
    sampled at control points
  * dynamic obstacles: per-(control point, obstacle, step) ellipsoid
    clearance penalty
  * feasibility: velocity/acceleration of the spline derivative control
    points beyond v_max/a_max

Uniform cubic B-spline with knot spacing dt: velocity control points
V_i = (Q_{i+1} - Q_i)/dt, acceleration A_i = (V_{i+1} - V_i)/dt;
evaluation via the standard cubic basis matrix.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


_M4 = jnp.array([
    [1.0, 4.0, 1.0, 0.0],
    [-3.0, 0.0, 3.0, 0.0],
    [3.0, -6.0, 3.0, 0.0],
    [-1.0, 3.0, -3.0, 1.0],
]) / 6.0


class BsplineConfig(NamedTuple):
    dt: float = 0.1
    max_vel: float = 5.0
    max_acc: float = 20.0
    clearance: float = 0.8
    w_smooth: float = 1.0
    w_collision: float = 20.0
    w_dynamic: float = 30.0
    w_feasibility: float = 1.0
    iters: int = 100
    lr: float = 0.15


class BsplineTrajectory(NamedTuple):
    ctrl: jnp.ndarray    # (M, 3) control points
    dt: jnp.ndarray
    cost: jnp.ndarray


def fit_control_points(path: jnp.ndarray) -> jnp.ndarray:
    """Initialize control points from a waypoint path: the uniform cubic
    B-spline with control points = waypoints padded at both ends tracks
    the path closely (bsplineTraj's pathSearch->control-point init)."""
    first = path[0:1]
    last = path[-1:]
    # triple the endpoints so the cubic spline interpolates them:
    # (Q0 + 4 Q1 + Q2)/6 = p0 when Q0 = Q1 = Q2 = p0
    return jnp.concatenate([first, first, path, last, last], axis=0)


def evaluate(traj: BsplineTrajectory, t) -> jnp.ndarray:
    """Spline position at time t (t in [0, (M-3) * dt])."""
    M = traj.ctrl.shape[0]
    seg = jnp.clip(jnp.floor(t / traj.dt).astype(jnp.int32), 0, M - 4)
    u = jnp.clip(t / traj.dt - seg, 0.0, 1.0)
    ub = jnp.stack([jnp.ones_like(u), u, u * u, u * u * u])
    w = ub @ _M4                                   # (4,)
    pts = jax.lax.dynamic_slice(traj.ctrl, (seg, 0), (4, 3))
    return w @ pts


def _esdf_at(esdf_grid: jnp.ndarray, origin, resolution, p):
    """Trilinearly interpolated ESDF lookup — differentiable in p, so
    collision penalties get spatial gradients (the autodiff equivalent of
    the reference's hand-derived guide-point gradients)."""
    x = (p - origin) / resolution - 0.5
    dims = jnp.array(esdf_grid.shape)
    i0 = jnp.floor(x).astype(jnp.int32)
    frac = x - i0.astype(x.dtype)
    inside = jnp.all((i0 >= 0) & (i0 < dims - 1), axis=-1)
    i0c = jnp.clip(i0, 0, dims - 2)

    v = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.where(dx, frac[..., 0], 1 - frac[..., 0])
                     * jnp.where(dy, frac[..., 1], 1 - frac[..., 1])
                     * jnp.where(dz, frac[..., 2], 1 - frac[..., 2]))
                v = v + w * esdf_grid[i0c[..., 0] + dx, i0c[..., 1] + dy,
                                      i0c[..., 2] + dz]
    return jnp.where(inside, v, 1e3)


def optimize(cfg: BsplineConfig, init_ctrl: jnp.ndarray,
             esdf_grid: Optional[jnp.ndarray] = None,
             esdf_origin=None, esdf_resolution: float = 0.15,
             obstacle_pos: Optional[jnp.ndarray] = None,
             obstacle_size: Optional[jnp.ndarray] = None
             ) -> BsplineTrajectory:
    """Optimize control points. Endpoints (first/last 3, which pin start and
    end state of a cubic spline) stay fixed.

    obstacle_pos/size: (K, P, 3) predicted obstacle series (optional).
    """
    M = init_ctrl.shape[0]
    free_mask = jnp.ones((M, 1))
    free_mask = free_mask.at[:3].set(0.0).at[-3:].set(0.0)

    def cost_fn(ctrl):
        c = init_ctrl + (ctrl - init_ctrl) * free_mask
        # smoothness: jerk of control points
        jerk = c[3:] - 3 * c[2:-1] + 3 * c[1:-2] - c[:-3]
        cost = cfg.w_smooth * jnp.sum(jerk ** 2)

        # feasibility
        v = (c[1:] - c[:-1]) / cfg.dt
        a = (v[1:] - v[:-1]) / cfg.dt
        cost += cfg.w_feasibility * (
            jnp.sum(jnp.clip(jnp.abs(v) - cfg.max_vel, 0.0, None) ** 2)
            + jnp.sum(jnp.clip(jnp.abs(a) - cfg.max_acc, 0.0, None) ** 2))

        # static collision via ESDF
        if esdf_grid is not None:
            d = _esdf_at(esdf_grid, jnp.asarray(esdf_origin),
                         esdf_resolution, c)
            pen = jnp.clip(cfg.clearance - d, 0.0, None)
            cost += cfg.w_collision * jnp.sum(pen ** 2)

        # dynamic obstacles: control point i is associated with spline time
        # i*dt; penalize ellipsoid intrusion against the obstacle position
        # predicted at that time
        if obstacle_pos is not None:
            K, P, _ = obstacle_pos.shape
            ti = jnp.clip(jnp.arange(M), 0, P - 1)
            op = obstacle_pos[:, ti]                  # (K, M, 3)
            os_ = obstacle_size[:, ti]
            dd = (c[None, :, :] - op) / (os_ / 2.0 + cfg.clearance)
            f = jnp.sum(dd ** 2, axis=-1)             # (K, M)
            cost += cfg.w_dynamic * jnp.sum(jnp.clip(1.0 - f, 0.0, None) ** 2)
        return cost

    import optax
    opt = optax.adam(cfg.lr)
    state = opt.init(init_ctrl)

    def step(carry, _):
        ctrl, st = carry
        g = jax.grad(cost_fn)(ctrl)
        up, st = opt.update(g, st, ctrl)
        return (optax.apply_updates(ctrl, up), st), None

    (ctrl, _), _ = jax.lax.scan(step, (init_ctrl, state), None,
                                length=cfg.iters)
    ctrl = init_ctrl + (ctrl - init_ctrl) * free_mask
    return BsplineTrajectory(ctrl=ctrl, dt=jnp.asarray(cfg.dt),
                             cost=cost_fn(ctrl))

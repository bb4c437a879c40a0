"""Minimum-snap piecewise-polynomial trajectory solver.

Rebuild of trajPlanner::polyTrajSolver (trajectory_planner/polyTrajSolver.cpp):
degree-7 polynomials per path segment in normalized segment time, snap
(4th-derivative) cost, with position endpoint/midpoint constraints,
velocity/acceleration endpoints, continuity up to `continuity_degree`, and
optional corridor inequality rows sampled along each segment.

The reference runs three sequential per-axis OSQP instances
(setUpProblem :162-223, solveX/Y/Z :870-905); here the three axis QPs are
one vmapped batched dense-ADMM solve (ops/dense_admm.py), and whole
*batches of trajectories* can vmap again above that.

Reference quirks handled:
  * constraint rows are written in normalized segment time tau in [0,1]
    with dt-ratio scaling on continuity rows (constructA :314-555), but
    the endpoint velocity/acceleration bounds are the raw values
    (constructBound :683-774) — i.e. boundary derivatives are interpreted
    in normalized time. Reproduced as-is (default init/end vel/acc are 0
    where it makes no difference).
  * getPos/getVel evaluate at the raw time offset t-t_i, NOT normalized
    (the normalization is commented out, :1032/:1064). sample() defaults
    to the mathematically consistent normalized evaluation; pass
    reference_compat=True for the literal behavior.

Corridor sampling count is static (samples_per_segment) instead of the
duration-dependent ceil(duration*res) (:998) — fixed shapes for XLA.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from intent_mpc_tpu.ops.dense_admm import solve_dense_qp

INF = jnp.inf


class PolyTrajConfig(NamedTuple):
    poly_degree: int = 7          # polynomial_degree (planner_param.yaml)
    diff_degree: int = 4          # differential_degree (snap cost)
    continuity_degree: int = 3
    samples_per_segment: int = 6  # static corridor sampling
    max_iter: int = 400
    # 'legendre': shifted-Legendre segment basis — same optimal trajectory
    # (the function space and constraints are identical), ~5 orders of
    # magnitude better-conditioned constraint rows than the reference's
    # monomial basis, which matters for the f32 TPU solve.
    # 'monomial': the reference's raw t^d basis.
    basis: str = "legendre"


def _basis_matrix(cfg: PolyTrajConfig) -> np.ndarray:
    """Column d = monomial coefficients of basis function d on tau in [0,1]."""
    D = cfg.poly_degree + 1
    if cfg.basis == "monomial":
        return np.eye(D)
    from numpy.polynomial import legendre as npleg
    from numpy.polynomial import polynomial as nppoly
    B = np.zeros((D, D))
    for d in range(D):
        leg = np.zeros(d + 1)
        leg[d] = 1.0
        poly = npleg.leg2poly(leg)          # coeffs in x on [-1,1]
        out = np.zeros(D)
        for k, a in enumerate(poly):        # substitute x = 2 tau - 1
            pk = nppoly.polypow([-1.0, 2.0], k)
            out[:len(pk)] += a * pk
        B[:, d] = out
    return B


class PolyTrajectory(NamedTuple):
    coeffs: jnp.ndarray      # (nseg, degree+1, 3) in `basis_mat` basis
    times: jnp.ndarray       # (N,) knot times
    prim_res: jnp.ndarray    # (3,) per-axis solver residuals
    basis_mat: jnp.ndarray   # (D, D) column d = monomial coeffs of basis fn d


def _snap_cost_block(cfg: PolyTrajConfig) -> np.ndarray:
    """Per-segment P block (constructP :241-272): integral over tau in [0,1]
    of the diff_degree-th derivative squared."""
    D = cfg.poly_degree + 1
    P = np.zeros((D, D))
    dd = cfg.diff_degree
    for i in range(dd, D):
        for j in range(dd, D):
            f = 1.0
            for d in range(dd):
                f *= (i - d) * (j - d)
            f /= (i + j - 2 * dd + 1)
            P[i, j] = f
    return P


def _deriv_row(D: int, order: int, tau: float) -> np.ndarray:
    row = np.zeros(D)
    for d in range(order, D):
        f = 1.0
        for k in range(order):
            f *= (d - k)
        row[d] = f * (tau ** (d - order) if d > order or tau != 0 else 1.0)
    return row


def avg_time_allocation(waypoints: jnp.ndarray, desired_vel: float) -> jnp.ndarray:
    """avgTimeAllocation (:125-138)."""
    dist = jnp.linalg.norm(waypoints[1:] - waypoints[:-1], axis=-1)
    return jnp.concatenate([jnp.zeros(1), jnp.cumsum(dist / desired_vel)])


def plan(waypoints: jnp.ndarray, desired_vel: float,
         cfg: PolyTrajConfig = PolyTrajConfig(),
         corridor_r: Optional[jnp.ndarray] = None,
         init_vel=None, end_vel=None, init_acc=None, end_acc=None
         ) -> PolyTrajectory:
    """Solve the min-snap trajectory through waypoints (N,3).

    corridor_r: optional (nseg,) corridor half-widths; when given,
    midpoints relax to +-r boxes and sampled corridor rows are added
    (soft-constraint + corridor modes, :629-660 / :815-840). r=0 disables
    a segment's corridor rows (:990).
    """
    N = waypoints.shape[0]
    nseg = N - 1
    D = cfg.poly_degree + 1
    n = nseg * D
    times = avg_time_allocation(waypoints, desired_vel)
    dts = times[1:] - times[:-1]
    Bm = _basis_matrix(cfg)

    # ---- cost: block-diagonal snap (in the chosen basis) ----
    Pblk = jnp.asarray(Bm.T @ _snap_cost_block(cfg) @ Bm)
    P = jax.scipy.linalg.block_diag(*([Pblk] * nseg)) if nseg > 1 \
        else jnp.asarray(Pblk)
    q = jnp.zeros(n)

    # ---- constraint rows (static structure; values may depend on dts) ----
    def _brow(order, tau):
        return _deriv_row(D, order, tau) @ Bm

    rows = []      # list of (n,) numpy or traced rows
    lbs = []
    ubs = []
    r0 = _brow(0, 0.0)
    r1 = _brow(0, 1.0)

    def seg_row(seg, row):
        out = np.zeros((nseg, D))
        out[seg] = row
        return jnp.asarray(out.reshape(-1))

    mid_r = corridor_r if corridor_r is not None else None

    # position: 2 endpoints
    rows.append(seg_row(0, r0)); lbs.append(waypoints[0]); ubs.append(waypoints[0])
    rows.append(seg_row(nseg - 1, r1)); lbs.append(waypoints[-1]); ubs.append(waypoints[-1])
    # position: k-1 midpoints (hard, or +-r with corridor)
    for i in range(nseg - 1):
        rows.append(seg_row(i, r1))
        w = waypoints[i + 1]
        if mid_r is None:
            lbs.append(w); ubs.append(w)
        else:
            lbs.append(w - mid_r[i]); ubs.append(w + mid_r[i])
    # position continuity
    for i in range(nseg - 1):
        rows.append(seg_row(i, r1) - seg_row(i + 1, r0))
        lbs.append(jnp.zeros(3)); ubs.append(jnp.zeros(3))

    def vec3(v):
        return jnp.zeros(3) if v is None else jnp.asarray(v)

    # velocity endpoints + continuity (dt-ratio scaled, :417-440)
    v0r, v1r = _brow(1, 0.0), _brow(1, 1.0)
    rows.append(seg_row(0, v0r)); lbs.append(vec3(init_vel)); ubs.append(vec3(init_vel))
    rows.append(seg_row(nseg - 1, v1r)); lbs.append(vec3(end_vel)); ubs.append(vec3(end_vel))
    for i in range(nseg - 1):
        rows.append(seg_row(i, v1r) * dts[i + 1] - seg_row(i + 1, v0r) * dts[i])
        lbs.append(jnp.zeros(3)); ubs.append(jnp.zeros(3))

    # acceleration endpoints + continuity
    a0r, a1r = _brow(2, 0.0), _brow(2, 1.0)
    rows.append(seg_row(0, a0r)); lbs.append(vec3(init_acc)); ubs.append(vec3(init_acc))
    rows.append(seg_row(nseg - 1, a1r)); lbs.append(vec3(end_acc)); ubs.append(vec3(end_acc))
    for i in range(nseg - 1):
        rows.append(seg_row(i, a1r) * dts[i + 1] ** 2
                    - seg_row(i + 1, a0r) * dts[i] ** 2)
        lbs.append(jnp.zeros(3)); ubs.append(jnp.zeros(3))

    # higher-order continuity
    for order in range(3, cfg.continuity_degree + 1):
        hl, hr = _brow(order, 1.0), _brow(order, 0.0)
        for i in range(nseg - 1):
            rows.append(seg_row(i, hl) * dts[i + 1] ** order
                        - seg_row(i + 1, hr) * dts[i] ** order)
            lbs.append(jnp.zeros(3)); ubs.append(jnp.zeros(3))

    # corridor rows: sampled along each segment (:815-840)
    if mid_r is not None:
        S = cfg.samples_per_segment
        for i in range(nseg):
            for s in range(S):
                tau = (s + 1) / (S + 1)
                rows.append(seg_row(i, _brow(0, tau)))
                pm = waypoints[i] + (waypoints[i + 1] - waypoints[i]) * tau
                active = mid_r[i] > 0
                lbs.append(jnp.where(active, pm - mid_r[i], -INF))
                ubs.append(jnp.where(active, pm + mid_r[i], INF))

    A = jnp.stack(rows)                       # (m, n)
    L = jnp.stack(lbs)                        # (m, 3)
    U = jnp.stack(ubs)

    res = jax.vmap(lambda l, u: solve_dense_qp(P, q, A, l, u,
                                               max_iter=cfg.max_iter),
                   in_axes=(1, 1))(L, U)
    coeffs = res.x.T.reshape(nseg, D, 3)      # res.x: (3, n)
    return PolyTrajectory(coeffs=coeffs, times=times, prim_res=res.prim_res,
                          basis_mat=jnp.asarray(Bm))


def sample(traj: PolyTrajectory, t, order: int = 0,
           reference_compat: bool = False) -> jnp.ndarray:
    """Evaluate position (order 0) / velocity (1) / acceleration (2).

    Default: normalized-time evaluation with dt chain rule. With
    reference_compat=True, evaluates at the raw offset t - t_i like
    getPos/getVel/getAcc (:1058-1122)."""
    times = traj.times
    nseg, D, _ = traj.coeffs.shape
    i = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, nseg - 1)
    dt = times[i + 1] - times[i]
    if reference_compat:
        tau = t - times[i]
        scale = 1.0
    else:
        tau = jnp.clip((t - times[i]) / jnp.maximum(dt, 1e-9), 0.0, 1.0)
        scale = 1.0 / jnp.maximum(dt, 1e-9) ** order
    d = jnp.arange(D)
    fac = jnp.ones(D)
    for k in range(order):
        fac = fac * jnp.maximum(d - k, 0)
    tp = jnp.where(d - order >= 0, tau ** jnp.maximum(d - order, 0), 0.0)
    mono = fac * tp
    basis = mono @ traj.basis_mat
    return jnp.einsum("dc,d->c", traj.coeffs[i], basis) * scale

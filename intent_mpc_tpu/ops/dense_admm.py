"""Generic batched dense-QP solver (OSQP-style ADMM) in pure JAX.

For components whose QPs are small and irregular — min-snap polynomial
trajectories (polyTrajSolver.cpp solves three per-axis OSQP problems),
B-spline fitting, etc. — where the specialized structured MPC solver
(ops/admm.py) does not apply. Dense P (n,n), A (m,n); vmap the leading
axis to batch (e.g. the three x/y/z axis problems of the poly solver
become one batched solve instead of three sequential OSQP instances).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


class DenseQPResult(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    prim_res: jnp.ndarray
    dual_res: jnp.ndarray


def _ruiz(P, q, A, iters):
    n = P.shape[0]
    m = A.shape[0]
    D = jnp.ones(n, P.dtype)
    E = jnp.ones(m, P.dtype)
    c = jnp.asarray(1.0, P.dtype)
    Ph, qh, Ah = P, q, A

    def safe_inv_sqrt(v):
        return jnp.where(v > 1e-12, jax.lax.rsqrt(jnp.maximum(v, 1e-12)), 1.0)

    for _ in range(iters):
        cn = jnp.maximum(jnp.max(jnp.abs(Ph), axis=0),
                         jnp.max(jnp.abs(Ah), axis=0) if m else 0.0)
        dd = safe_inv_sqrt(cn)
        Ph = dd[:, None] * Ph * dd[None, :]
        qh = dd * qh
        Ah = Ah * dd[None, :]
        D = D * dd
        rn = jnp.max(jnp.abs(Ah), axis=1)
        de = safe_inv_sqrt(rn)
        Ah = de[:, None] * Ah
        E = E * de
        pcol = jnp.mean(jnp.max(jnp.abs(Ph), axis=0))
        qinf = jnp.max(jnp.abs(qh))
        denom = jnp.maximum(pcol, qinf)
        g = jnp.where(denom > 1e-12, 1.0 / denom, 1.0)
        Ph = Ph * g
        qh = qh * g
        c = c * g
    return Ph, qh, Ah, D, E, c


def solve_dense_qp(P: jnp.ndarray, q: jnp.ndarray, A: jnp.ndarray,
                   l: jnp.ndarray, u: jnp.ndarray,
                   max_iter: int = 400, rho: float = 0.1,
                   sigma: float = 1e-6, alpha: float = 1.6,
                   scaling_iters: int = 3, adapt_blocks: int = 4,
                   polish_iters: int = 40,
                   x0: Optional[jnp.ndarray] = None) -> DenseQPResult:
    """min 1/2 x'Px + q'x  s.t. l <= Ax <= u (single problem; vmap to batch).

    Adaptive rho: iterations split into `adapt_blocks` blocks; between
    blocks rho scales by sqrt(scaled prim res / scaled dual res) (OSQP's
    update rule) and the normal matrix is refactorized.
    """
    n = P.shape[0]
    m = A.shape[0]
    Ph, qh, Ah, D, E, c = _ruiz(P, q, A, scaling_iters)
    lh, uh = E * l, E * u

    eqr = jnp.isfinite(lh) & jnp.isfinite(uh) & (jnp.abs(uh - lh) < 1e-12)
    loose = jnp.isneginf(lh) & jnp.isposinf(uh)

    eye = jnp.eye(n, dtype=P.dtype)

    def mk_rho(r):
        return jnp.where(eqr, jnp.clip(r * 1e3, 1e-6, 1e6),
                         jnp.where(loose, 1e-6, r))

    def factor(rho_v):
        M = Ph + sigma * eye \
            + jnp.matmul(Ah.T * rho_v[None, :], Ah, precision=_PREC)
        L = jnp.linalg.cholesky(M)
        Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        return M, jnp.matmul(Linv.T, Linv, precision=_PREC)

    def run_block(x, z, y, rho_v, M, Minv, iters):
        def step(carry, _):
            x, z, y = carry
            rhs = sigma * x - qh + jnp.matmul(Ah.T, rho_v * z - y,
                                              precision=_PREC)
            x_t = jnp.matmul(Minv, rhs, precision=_PREC)
            r = rhs - jnp.matmul(M, x_t, precision=_PREC)
            x_t = x_t + jnp.matmul(Minv, r, precision=_PREC)
            z_t = jnp.matmul(Ah, x_t, precision=_PREC)
            x_n = alpha * x_t + (1 - alpha) * x
            z_rel = alpha * z_t + (1 - alpha) * z
            z_n = jnp.clip(z_rel + y / rho_v, lh, uh)
            y_n = y + rho_v * (z_rel - z_n)
            return (x_n, z_n, y_n), None
        (x, z, y), _ = jax.lax.scan(step, (x, z, y), None, length=iters)
        return x, z, y

    xs = jnp.zeros(n, P.dtype) if x0 is None else x0 / D
    zs = jnp.matmul(Ah, xs, precision=_PREC)
    ys = jnp.zeros(m, P.dtype)

    r_s = jnp.asarray(rho, P.dtype)
    block_iters = max(max_iter // max(adapt_blocks, 1), 1)
    for b in range(adapt_blocks):
        rho_v = mk_rho(r_s)
        M, Minv = factor(rho_v)
        xs, zs, ys = run_block(xs, zs, ys, rho_v, M, Minv, block_iters)
        if b < adapt_blocks - 1:
            ax = jnp.matmul(Ah, xs, precision=_PREC)
            aty = jnp.matmul(Ah.T, ys, precision=_PREC)
            pr = jnp.max(jnp.abs(ax - zs))
            dr = jnp.max(jnp.abs(jnp.matmul(Ph, xs, precision=_PREC) + qh + aty))
            prs = pr / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(ax)),
                                               jnp.max(jnp.abs(zs))), 1e-10)
            drs = dr / jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(jnp.matmul(Ph, xs, precision=_PREC))),
                            jnp.maximum(jnp.max(jnp.abs(aty)),
                                        jnp.max(jnp.abs(qh)))), 1e-10)
            ratio = jnp.sqrt(prs / jnp.maximum(drs, 1e-12))
            # OSQP rule: adapt only when the ratio leaves [1/5, 5]
            do = (ratio > 5.0) | (ratio < 0.2)
            r_s = jnp.where(do, jnp.clip(r_s * ratio, 1e-6, 1e6), r_s)

    # ---- fixed-shape polish (OSQP polish analogue) ----
    # ADMM's tail on active inequalities is slow; detect the active set from
    # the final iterate, snap those rows to equalities with a high penalty,
    # and run a short second phase. Keep the polished iterate only if it
    # reduces the primal violation.
    if polish_iters > 0:
        axs = jnp.matmul(Ah, xs, precision=_PREC)
        tol = 1e-3
        low_act = (axs - lh < tol * (1.0 + jnp.abs(lh))) & jnp.isfinite(lh)
        upp_act = (uh - axs < tol * (1.0 + jnp.abs(uh))) & jnp.isfinite(uh)
        act = low_act | upp_act | eqr
        bnd = jnp.where(upp_act & ~eqr, uh, lh)
        lp = jnp.where(act, bnd, lh)
        up = jnp.where(act, bnd, uh)
        rho_p = jnp.where(act, 1e3, jnp.where(loose, 1e-6, 1e-2))
        Mp = Ph + sigma * eye \
            + jnp.matmul(Ah.T * rho_p[None, :], Ah, precision=_PREC)
        Lp = jnp.linalg.cholesky(Mp)
        Lpinv = jax.scipy.linalg.solve_triangular(Lp, eye, lower=True)
        Mpinv = jnp.matmul(Lpinv.T, Lpinv, precision=_PREC)

        def pstep(carry, _):
            x, z, y = carry
            rhs = sigma * x - qh + jnp.matmul(Ah.T, rho_p * z - y,
                                              precision=_PREC)
            x_t = jnp.matmul(Mpinv, rhs, precision=_PREC)
            rres = rhs - jnp.matmul(Mp, x_t, precision=_PREC)
            x_t = x_t + jnp.matmul(Mpinv, rres, precision=_PREC)
            z_t = jnp.matmul(Ah, x_t, precision=_PREC)
            x_n = alpha * x_t + (1 - alpha) * x
            z_rel = alpha * z_t + (1 - alpha) * z
            z_n = jnp.clip(z_rel + y / rho_p, lp, up)
            y_n = y + rho_p * (z_rel - z_n)
            return (x_n, z_n, y_n), None

        (xp, zp, yp), _ = jax.lax.scan(pstep, (xs, zs, ys), None,
                                       length=polish_iters)

        def viol(xv):
            av = jnp.matmul(Ah, xv, precision=_PREC)
            return jnp.max(jnp.maximum(jnp.clip(lh - av, 0.0, None),
                                       jnp.clip(av - uh, 0.0, None)))

        better = viol(xp) < viol(xs)
        xs = jnp.where(better, xp, xs)
        ys = jax.tree.map(lambda a, b2: jnp.where(better, a, b2), yp, ys)

    x = D * xs
    y = (E * ys) / c
    ax = jnp.matmul(A, x, precision=_PREC)
    zq = jnp.clip(ax, l, u)
    prim = jnp.max(jnp.abs(ax - zq)) if m else jnp.asarray(0.0)
    dual = jnp.max(jnp.abs(jnp.matmul(P, x, precision=_PREC) + q
                           + jnp.matmul(A.T, y, precision=_PREC)))
    return DenseQPResult(x=x, y=y, prim_res=prim, dual_res=dual)

"""Batched OSQP-style ADMM solver in pure JAX.

Replaces the vendored OsqpEigen/libosqp solver (trajectory_planner/
third_party/OsqpEigen, used at mpcPlanner.cpp:436-527). Same algorithm as
OSQP — Ruiz equilibration, per-row penalty rho (1e3x on equality rows,
1e-6 on loose rows), over-relaxed ADMM — redesigned for TPU:

  * structured matvecs: A never materializes (ops/qp.py closed forms).
  * the x-update linear system M = P + sigma I + A^T rho A is assembled
    from block structure, Cholesky-factorized ONCE per solve, and
    explicitly inverted so every iteration is a batched matvec
    (MXU-friendly; triangular solves are sequential and slow on TPU).
  * iterations are a fixed-count lax.scan (static shapes; the reference's
    wall-clock `solver_time_limit` becomes an iteration budget).
  * candidates/scenarios vmap over leading axes; thousands of QPs solve
    simultaneously per chip.

Scaled iteration (OSQP):
  x~ = M^{-1} (sigma x - q + A^T (rho z - y))
  x+ = alpha x~ + (1-alpha) x
  z+ = clip(alpha A x~ + (1-alpha) z + y/rho, l, u)
  y+ = y + rho (alpha A x~ + (1-alpha) z - z+)

Warm start follows the reference protocol: primal from the previous
solution, dual zero (mpcPlanner.cpp:485-509).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from intent_mpc_tpu.ops import qp as qplib
from intent_mpc_tpu.ops.qp import ConVec, QPData
from intent_mpc_tpu.utils.config import PlannerConfig, SolverConfig

_PREC = jax.lax.Precision.HIGHEST


class ADMMResult(NamedTuple):
    x: jnp.ndarray          # (n,) primal solution (unscaled)
    y: ConVec               # dual (unscaled)
    prim_res: jnp.ndarray   # scalar ||Ax - z||_inf (unscaled)
    dual_res: jnp.ndarray   # scalar ||Px + q + A^T y||_inf (unscaled)
    solved: jnp.ndarray     # bool: primal residual within tolerance
    rho_suggest: jnp.ndarray  # OSQP adaptive-rho suggestion for the NEXT
                              # solve of this (slowly-evolving) problem


class Scaling(NamedTuple):
    D: jnp.ndarray          # (n,) column scaling
    E: ConVec               # row scaling
    c: jnp.ndarray          # scalar cost scaling


class Factor(NamedTuple):
    """Shared x-update preconditioner: the Ruiz scaling and explicit
    inverse of ONE representative QP's normal matrix, reused across the 6
    intent-candidate solves of a replan cycle (admm_factor /
    admm_solve(factor=...)). The TPU motivation (RESULTS.md profile): the
    ADMM iterations cost ~20 us each while the batched Cholesky dominates
    the solve, so factoring once per scenario instead of once per
    candidate removes most of the setup cost; per-candidate exactness is
    restored by structured iterative refinement against the candidate's
    own fresh normal matrix inside every x-update — or exactly, with a
    Woodbury correction over the rows that differ from the mean QP
    (admm_solve(diff_slots=...); the 6 intent candidates differ only in
    the closest obstacle's slot and the second-series slot)."""
    D: jnp.ndarray
    E: ConVec
    c: jnp.ndarray
    Minv: jnp.ndarray       # (n, n)
    qp_mean: Optional[QPData] = None  # the factored QP (Woodbury base)


def make_folded_m_op(cfg: PlannerConfig, qp: QPData, h_s, sigma,
                     rho_inner: ConVec, D):
    """Pre-folded apply of the scaled normal matrix M = H_s + sigma I +
    (DA)^T E^2 rho (AD) for the refinement loop.

    Identical math to `rhs - at_s(rho . a_s(x))` (each constraint row r
    contributes (e_r^T v) e_r with e_r = sqrt(rho_r) E_r (row_r . D)), but
    the D/E/rho scalings and masks are folded into the constraint data
    ONCE per solve, so each apply reads one pre-scaled gradient tensor
    instead of re-materializing scaled intermediates.

    MEASURED NEGATIVE (SolverConfig.folded_refine stays False): on v5e
    this form is equal to the default at batch 32 and 40% slower at
    batch 128 (5643 vs 9330 solves/s) — XLA already fuses the scaled
    round trip to its floor and the folded form's concats/rescales
    fuse worse at large batch. Kept as an independently-tested
    equivalent of the refinement operator (test_qp asserts 1e-7
    agreement), and as the record of the experiment."""
    H, W = cfg.horizon, cfg.mpc_window
    NX, NU = qplib.NX, qplib.NU
    ts = cfg.ts
    Dx = D[:NX * H].reshape(H, NX)
    Du = D[NX * H:].reshape(W, NU)

    se = rho_inner.map(lambda r: jnp.sqrt(r))   # sqrt(rho) * E per row

    # identity rows (state/control bounds) fold into a diagonal together
    # with the scaled cost + sigma (applied on the scaled variable)
    diag = h_s + sigma + qplib.merge_z((se.sb * Dx) ** 2,
                                       (se.cb * Du) ** 2)
    re_eq = rho_inner.eq                                   # (H,8)

    # obstacle/FOV rows pre-folded: act reproduces at_matvec's row gate
    # (inactive rows contribute nothing). NOTE: the dynamics rows stay in
    # the closed-form shift form below — a first cut pre-folded them into
    # per-step (8,8)/(8,5) blocks applied as batched small dots, which
    # lowered to 8-wide matvecs padded to 128 MXU lanes and ran 4x SLOWER
    # end to end (2021 vs 9330 solves/s at batch 128 — the same pathology
    # as SolverConfig.block_refine).
    eo = se.obs * qp.obs_active                            # (W,K)
    Gh = qp.G * eo[..., None]                              # (W,K,3)
    sl = eo * qp.obs_slack
    sd = sl * qp.obs_dyn                                   # (W,K)
    ss = sl * (1.0 - qp.obs_dyn)

    def m_op(v):
        # raw-variable view z' = D v: rows apply in reference closed
        # form; the trailing D multiply restores the scaled-space
        # transpose
        X = Dx * v[:NX * H].reshape(H, NX)
        U = Du * v[NX * H:].reshape(W, NU)
        p, vl, dd = X[:, 0:3], X[:, 3:6], X[:, 6:8]
        a, s = U[:, 0:3], U[:, 3:5]

        # dynamics rows (a_matvec eq section), weighted by rho E^2
        nxt_p = p[:-1] + ts * vl[:-1] + 0.5 * ts * ts * a - p[1:]
        nxt_v = vl[:-1] + ts * a - vl[1:]
        nxt_d = s - dd[1:]
        eq = jnp.concatenate(
            [-X[0:1], jnp.concatenate([nxt_p, nxt_v, nxt_d], axis=-1)],
            axis=0)
        w_eq = re_eq * eq                                  # (H,8)

        # transpose of the eq rows (at_matvec eq section)
        yX = jnp.zeros((H, NX)).at[0].add(-w_eq[0])
        wn = w_eq[1:]                                      # (W,8)
        atw = jnp.concatenate(
            [wn[:, 0:3], ts * wn[:, 0:3] + wn[:, 3:6],
             jnp.zeros((W, 2))], axis=-1)
        yX = yX.at[:-1].add(atw)
        yX = yX.at[1:].add(-wn)
        yU = jnp.concatenate(
            [0.5 * ts * ts * wn[:, 0:3] + ts * wn[:, 3:6], wn[:, 6:8]],
            axis=-1)

        # obstacle rows through the single pre-scaled gradient tensor
        r = (jnp.einsum("wkd,wd->wk", Gh, p[:-1], precision=_PREC)
             - sd * s[:, 0][:, None] - ss * s[:, 1][:, None])
        yX = yX.at[:-1, 0:3].add(jnp.einsum("wk,wkd->wd", r, Gh,
                                            precision=_PREC))
        yU = yU.at[:, 3].add(-jnp.sum(r * sd, axis=-1))
        yU = yU.at[:, 4].add(-jnp.sum(r * ss, axis=-1))
        return diag * v + qplib.merge_z(Dx * yX, Du * yU)

    return m_op


from functools import lru_cache


@lru_cache(maxsize=8)
def _static_a_top(horizon: int, window: int, ts: float):
    """The qp-independent top block of the constraint matrix — dynamics
    equality rows + state-bound identity + control-bound identity, in
    con_to_flat order [eq (H*8), sb (H*8), cb (W*5)] — as ONE dense
    (625, n) constant shared by every candidate/scenario/cycle.

    Motivation (RESULTS.md roofline): the closed-form a_s/at_s chains are
    ~100 small fused VPU ops per ADMM iteration at ~1 us fixed cost each;
    this matrix turns the entire eq/sb/cb section of both matvecs into
    one lane-filling MXU matmul against a 0.96 MB loop constant."""
    import numpy as np
    H, W = horizon, window
    NXc, NUc = 8, 5
    n = NXc * H + NUc * W
    A = np.zeros((NXc, NXc), np.float32)
    A[0:3, 0:3] = np.eye(3)
    A[0:3, 3:6] = np.eye(3) * ts
    A[3:6, 3:6] = np.eye(3)
    B = np.zeros((NXc, NUc), np.float32)
    B[0:3, 0:3] = np.eye(3) * 0.5 * ts * ts
    B[3:6, 0:3] = np.eye(3) * ts
    B[6:8, 3:5] = np.eye(2)

    top = np.zeros((NXc * H + NXc * H + NUc * W, n), np.float32)
    # eq row block (a_matvec eq section): row (0, j) = -x0_j;
    # row (i>=1, j) = A[j] @ x_{i-1} + B[j] @ u_{i-1} - x_i[j]
    top[0:NXc, 0:NXc] = -np.eye(NXc)
    for i in range(1, H):
        r = NXc * i
        top[r:r + NXc, NXc * (i - 1):NXc * i] = A
        top[r:r + NXc, NXc * H + NUc * (i - 1):NXc * H + NUc * i] = B
        top[r:r + NXc, NXc * i:NXc * (i + 1)] -= np.eye(NXc)
    # sb block: identity on x; cb block: identity on u
    top[NXc * H:2 * NXc * H, 0:NXc * H] = np.eye(NXc * H)
    top[2 * NXc * H:, NXc * H:] = np.eye(NUc * W)
    return jnp.asarray(top)


def ruiz_equilibrate(cfg: PlannerConfig, qp: QPData, hdiag: jnp.ndarray,
                     iters: int) -> Scaling:
    """Ruiz equilibration of [P A^T; A 0] + OSQP cost scaling.

    Operates entirely on the structured representation via closed-form
    row/col abs-max norms (qp.a_rowmax / qp.a_colmax). P is diagonal, so
    its scaled column norms are c*D^2*|h|.
    """
    n = cfg.num_vars
    D = jnp.ones(n)
    E = ConVec(*(jnp.ones_like(a) for a in qplib.a_matvec(cfg, qp, D)))
    c = jnp.asarray(1.0)

    def safe_inv_sqrt(v):
        return jnp.where(v > 1e-12, jax.lax.rsqrt(jnp.maximum(v, 1e-12)), 1.0)

    for _ in range(iters):
        # column norms of scaled [P; A]
        pcol = c * D * D * jnp.abs(hdiag)
        acol = qplib.a_colmax(cfg, qp, E)
        acol = acol * D
        cn = jnp.maximum(pcol, acol)
        dd = safe_inv_sqrt(cn)
        D = D * dd
        # row norms of scaled A
        rn = qplib.a_rowmax(cfg, qp, D).scale(E)
        de = rn.map(safe_inv_sqrt)
        E = E.scale(de)
        # cost scaling
        pcol = c * D * D * jnp.abs(hdiag)
        qs = c * D * jnp.abs(qp.q)
        denom = jnp.maximum(jnp.mean(pcol), jnp.max(qs))
        g = jnp.where(denom > 1e-12, 1.0 / denom, 1.0)
        c = c * g
    return Scaling(D=D, E=E, c=c)


def admm_factor(cfg: PlannerConfig, qp: QPData,
                scfg: Optional[SolverConfig] = None,
                rho_override=None) -> Factor:
    """Scaling + explicit normal-matrix inverse of one (representative)
    QP, for reuse across candidate solves via admm_solve(factor=...)."""
    scfg = scfg or cfg.solver
    hdiag = qplib.hessian_diag(cfg)
    sc = ruiz_equilibrate(cfg, qp, hdiag, scfg.scaling_iters)
    D, E, c = sc.D, sc.E, sc.c
    h_s = c * D * D * hdiag
    rho_base = scfg.rho if rho_override is None else rho_override
    rho = qplib.rho_vec(cfg, qp, rho_base, scfg.rho_eq_scale)
    rho_inner = rho.map(lambda r, e: r * e * e, E)
    Minv = _explicit_minv(cfg, qp, h_s, scfg, rho_inner, D)
    if scfg.minv_dtype == "bf16":
        # preconditioner-only storage (see SolverConfig.minv_dtype):
        # halves the iteration's dominant HBM read; CG's exact f32
        # residuals/steps keep the x-update fixed point unchanged
        Minv = Minv.astype(jnp.bfloat16)
    return Factor(D=D, E=E, c=c, Minv=Minv, qp_mean=qp)


def _explicit_minv(cfg: PlannerConfig, qp: QPData, h_s, scfg: SolverConfig,
                   rho_inner: ConVec, D) -> jnp.ndarray:
    """Explicit inverse of the scaled x-update normal matrix, via the
    block-tridiagonal factorization (default) or the dense Cholesky."""
    if scfg.structured_factor:
        from intent_mpc_tpu.ops.block_chol import structured_minv
        return structured_minv(cfg, qp, h_s, scfg.sigma, rho_inner, D)
    M = qplib.assemble_normal_matrix(cfg, qp, h_s, scfg.sigma, rho_inner,
                                     col_scale=D)
    L = jnp.linalg.cholesky(M)
    eye = jnp.eye(cfg.num_vars, dtype=M.dtype)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return jnp.matmul(Linv.T, Linv, precision=_PREC)


def _slot_columns(cfg: PlannerConfig, qp: QPData, rho_obs: jnp.ndarray,
                  D: jnp.ndarray, E_obs: jnp.ndarray,
                  slots: jnp.ndarray) -> jnp.ndarray:
    """Scaled sqrt-weighted row vectors of the obstacle rows in `slots`.

    Each obstacle row [g . p_w - slack_w >= lo] contributes to the scaled
    normal matrix as rho * a a^T with a = E_row * (A D)_row. With a
    (possibly fractional) dynamic-slack mix d the contribution splits
    into exactly two rank-1 terms (matching assemble_normal_matrix's
    slack diagonals/crosses):
        sqrt(rho d)       * [g ; -1 at u_w[3]]
        sqrt(rho (1 - d)) * [g ; -1 at u_w[4]]
    Returns (n, 2 * S * W * 2) columns for S slots.
    """
    H, W = cfg.horizon, cfg.mpc_window
    n = cfg.num_vars
    wi = jnp.arange(W)
    G = qp.G[:, slots]                     # (W, S, 3)
    Es = E_obs[:, slots]                   # (W, S)
    # inactive rows contribute ZERO to the normal matrix
    # (assemble_normal_matrix masks rho by activity) -> zero columns
    rho_s = rho_obs[:, slots] * qp.obs_active[:, slots]
    dyn = qp.obs_dyn[:, slots]
    slk = qp.obs_slack[:, slots]
    S = slots.shape[0]

    xcols = 8 * wi[:, None] + jnp.arange(3)[None]                  # (W,3)
    u3 = 8 * H + 5 * wi + 3
    u4 = 8 * H + 5 * wi + 4

    def side(ucol, weight):
        # (W, S, n) rows: g on x, -1 on the slack column, scaled+weighted
        base = jnp.zeros((W, S, n), G.dtype)
        gv = Es[:, :, None] * G * D[xcols][:, None, :]
        base = base.at[wi[:, None, None],
                       jnp.zeros((1, S, 1), jnp.int32) + jnp.arange(S)[None, :, None],
                       xcols[:, None, :]].set(gv)
        sv = -Es * slk * D[ucol][:, None]
        base = base.at[wi[:, None], jnp.arange(S)[None, :],
                       ucol[:, None]].set(sv)
        w = jnp.sqrt(jnp.maximum(rho_s * weight, 0.0))
        return base * w[:, :, None]

    cols = jnp.concatenate([side(u3, dyn), side(u4, 1.0 - dyn)], axis=1)
    return cols.reshape(W * 2 * S, n).T                            # (n, 2SW)


def _solve_flat(cfg: PlannerConfig, qp: QPData, scfg: SolverConfig,
                factor: Factor, D, E, c, h_s, q_s, rho, xs0, iters: int):
    """The ADMM iteration scan in FLAT constraint space (SolverConfig.
    flat_iter): z/y/l/u/rho live as single (m,) vectors, the qp-invariant
    eq/sb/cb section of A and A^T applies as one matmul against the
    static _static_a_top constant, and the obstacle rows apply through
    per-solve pre-folded coefficient tensors. Identical math to the
    grouped path (test_qp pins the iterates); ~4x fewer ops per
    iteration. Returns (xs, zs, ys) in scaled space with zs/ys as ConVec.
    """
    H, W = cfg.horizon, cfg.mpc_window
    NXc, NUc = qplib.NX, qplib.NU
    K = qp.G.shape[1]
    n = cfg.num_vars
    sigma, alpha = scfg.sigma, scfg.alpha
    Minv = factor.Minv

    A_top = _static_a_top(H, W, cfg.ts)
    m_top = A_top.shape[0]
    Dx = D[: NXc * H].reshape(H, NXc)
    Du = D[NXc * H:].reshape(W, NUc)

    e_flat = qplib.con_to_flat(E)
    e_top = e_flat[:m_top]
    rho_f = qplib.con_to_flat(rho)
    l_f = qplib.con_to_flat(qp.l.scale(E))
    u_f = qplib.con_to_flat(qp.u.scale(E))

    # pre-folded obstacle coefficients (scaled rows applied to scaled x):
    # row (w,k): e * [ G . (Dx_w p^) - slack * (dyn Du3 u3^ + (1-d) Du4 u4^) ]
    act = qp.obs_active
    Gh = qp.G * E.obs[..., None] * Dx[:-1, None, 0:3]          # (W,K,3)
    sl = E.obs * qp.obs_slack * act
    sd = sl * qp.obs_dyn * Du[:, 3][:, None]                   # (W,K)
    ss = sl * (1.0 - qp.obs_dyn) * Du[:, 4][:, None]

    def a_flat(x):
        xd = D * x
        top = e_top * jnp.matmul(A_top, xd, precision=_PREC)
        X = xd[: NXc * H].reshape(H, NXc)
        U = xd[NXc * H:].reshape(W, NUc)
        # the D fold is already inside Gh/sd/ss -> use the UNSCALED vars
        Xu = x[: NXc * H].reshape(H, NXc)
        Uu = x[NXc * H:].reshape(W, NUc)
        obs = jnp.einsum("wkd,wd->wk", Gh, Xu[:-1, 0:3],
                         precision=_PREC) \
            - sd * Uu[:, 3][:, None] - ss * Uu[:, 4][:, None]
        del X, U
        return jnp.concatenate([top, obs.reshape(-1)])

    def at_flat(w):
        top = jnp.matmul(A_top.T, e_top * w[:m_top], precision=_PREC)
        wo = w[m_top:].reshape(W, K)
        Xg = jnp.zeros((H, NXc)).at[:-1, 0:3].add(
            jnp.einsum("wk,wkd->wd", wo, Gh, precision=_PREC))
        Ug = jnp.zeros((W, NUc))
        Ug = Ug.at[:, 3].add(-jnp.sum(wo * sd, axis=-1))
        Ug = Ug.at[:, 4].add(-jnp.sum(wo * ss, axis=-1))
        return D * top + qplib.merge_z(Xg, Ug)

    def m_op(v):
        return h_s * v + sigma * v + at_flat(rho_f * a_flat(v))

    refine = scfg.shared_refine_iters
    warm_x0 = scfg.shared_refine_mode == "cg" \
        and scfg.shared_refine_x0 == "prev"
    tiny = jnp.asarray(1e-30, Minv.dtype)

    def msolve(rhs, x_init):
        if scfg.shared_refine_mode == "cg" and refine > 0:
            if warm_x0:
                x = x_init
            else:
                x = jnp.matmul(Minv, rhs, precision=_PREC)
            r = rhs - m_op(x)
            z = jnp.matmul(Minv, r, precision=_PREC)
            p = z
            rz = jnp.vdot(r, z)
            for j in range(refine):
                ap = m_op(p)
                pap = jnp.vdot(p, ap)
                a = jnp.where(jnp.abs(pap) > tiny, rz / pap, 0.0)
                x = x + a * p
                if j < refine - 1:
                    r = r - a * ap
                    z = jnp.matmul(Minv, r, precision=_PREC)
                    rz_n = jnp.vdot(r, z)
                    b = jnp.where(jnp.abs(rz) > tiny, rz_n / rz, 0.0)
                    rz = rz_n
                    p = z + b * p
            return x
        x = jnp.matmul(Minv, rhs, precision=_PREC)
        for _ in range(refine):
            x = x + jnp.matmul(Minv, rhs - m_op(x), precision=_PREC)
        return x

    def step(carry, _):
        x, z, y, xt_prev = carry
        rhs = sigma * x - q_s + at_flat(rho_f * z - y)
        x_t = msolve(rhs, xt_prev)
        ax = a_flat(x_t)
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_relax = alpha * ax + (1.0 - alpha) * z
        z_n = jnp.clip(z_relax + y / rho_f, l_f, u_f)
        y_n = y + rho_f * (z_relax - z_n)
        return (x_n, z_n, y_n, x_t), None

    z0 = a_flat(xs0)
    y0 = jnp.zeros_like(z0)
    (xs, zf, yf, _), _ = jax.lax.scan(step, (xs0, z0, y0, xs0), None,
                                      length=iters)
    return xs, qplib.flat_to_con(zf, cfg, K), qplib.flat_to_con(yf, cfg, K)


def admm_solve(cfg: PlannerConfig, qp: QPData,
               x0: Optional[jnp.ndarray] = None,
               max_iter: Optional[int] = None,
               scfg: Optional[SolverConfig] = None,
               feas_tol: float = 5e-2,
               rho_override=None,
               factor: Optional[Factor] = None,
               diff_slots: Optional[jnp.ndarray] = None) -> ADMMResult:
    """Solve one QP (vmap over a leading axis for batches).

    rho_override: scalar base penalty replacing scfg.rho — used for
    *temporal* rho adaptation: the closed loop carries the adapted rho of
    the previous replan cycle (the problems evolve slowly, so OSQP's
    adaptive-rho fixed point transfers), avoiding in-solve refactorization.

    factor: a shared Factor from admm_factor (typically of the mean of the
    candidate QPs). Skips this QP's Ruiz + assembly + Cholesky; the
    factor's Minv acts as a preconditioner and `scfg.shared_refine_iters`
    steps of iterative refinement against THIS QP's normal matrix (applied
    in closed form — never assembled) restore per-candidate accuracy.
    """
    scfg = scfg or cfg.solver
    n = cfg.num_vars
    hdiag = qplib.hessian_diag(cfg)

    if factor is None:
        sc = ruiz_equilibrate(cfg, qp, hdiag, scfg.scaling_iters)
        D, E, c = sc.D, sc.E, sc.c
    else:
        D, E, c = factor.D, factor.E, factor.c
    h_s = c * D * D * hdiag
    q_s = c * D * qp.q
    l_s = qp.l.scale(E)
    u_s = qp.u.scale(E)

    rho_base = scfg.rho if rho_override is None else rho_override
    rho = qplib.rho_vec(cfg, qp, rho_base, scfg.rho_eq_scale)
    # scaled rows: rho acts on scaled A rows -> effective rho_row * E^2 inside
    # A^T rho A of the scaled system is handled by scaling A itself; we fold
    # E into the matvecs below instead.

    def a_s(x):      # scaled A: E * A(D x)
        return qplib.a_matvec(cfg, qp, D * x).scale(E)

    def at_s(w):     # scaled A^T: D * A^T(E w)
        return D * qplib.at_matvec(cfg, qp, w.scale(E))

    rho_inner = rho.map(lambda r, e: r * e * e, E)

    def m_apply(v):
        # THIS QP's scaled normal matrix in closed form: a_s/at_s each
        # fold one E, so at_s(rho . a_s(v)) carries the rho E^2 inner
        # weight without assembling M
        return h_s * v + scfg.sigma * v + at_s(a_s(v).map(
            lambda a, ri: a * ri, rho))

    m_op = m_apply  # refinement normal operator (block branch overrides)

    if factor is None:
        Minv = _explicit_minv(cfg, qp, h_s, scfg, rho_inner, D)
        refine = scfg.refine_iters

        def m_residual(rhs, x):
            # closed-form M @ x (this QP's own normal matrix, never
            # assembled densely)
            return rhs - m_apply(x)
    elif diff_slots is not None and scfg.woodbury_candidates:
        # EXACT per-candidate x-update: the shared factor is built from
        # the candidate-mean QP with the rows of `diff_slots` REMOVED
        # (make_plan_with_pred zeroes their activity before admm_factor),
        # so this candidate's normal matrix is a purely POSITIVE low-rank
        # update of the factored base:
        #   M_cand = M_base + U U^T,   U = this candidate's scaled
        #   sqrt(rho)-weighted rows of the two differing slots (4W cols).
        # Woodbury: M_cand^{-1} v = Minv v - T (U^T (Minv v)) with
        # T = Minv U C^{-1} and C = I + U^T Minv U — SPD, so the
        # capacitance factorizes with a small Cholesky (no batched LU).
        # No refinement iterations; per-iteration cost is two thin
        # (n, 4W) matvecs on top of the shared Minv read.
        Minv = factor.Minv
        refine = 0
        U = _slot_columns(cfg, qp, rho.obs, D, E.obs, diff_slots)
        k2 = U.shape[1]
        Wu = jnp.matmul(Minv, U, precision=_PREC)
        C = jnp.eye(k2, dtype=U.dtype) \
            + jnp.matmul(U.T, Wu, precision=_PREC)
        Lc = jnp.linalg.cholesky(C)
        Lci = jax.scipy.linalg.solve_triangular(
            Lc, jnp.eye(k2, dtype=U.dtype), lower=True)
        Cinv = jnp.matmul(Lci.T, Lci, precision=_PREC)
        T = jnp.matmul(Wu, Cinv, precision=_PREC)

        def m_residual(rhs, x):          # unused at refine == 0
            return rhs - m_apply(x)

        def msolve_woodbury(rhs):
            v = jnp.matmul(Minv, rhs, precision=_PREC)
            return v - jnp.matmul(T, jnp.matmul(U.T, v, precision=_PREC),
                                  precision=_PREC)
    else:
        Minv = factor.Minv
        refine = scfg.shared_refine_iters
        if scfg.block_refine:
            # refinement against THIS candidate's normal matrix through
            # its block-tridiagonal blocks: ~20 KB of operand per apply
            # vs a full constraint-space round trip (the measured
            # refinement hotspot, RESULTS.md stage profile)
            from intent_mpc_tpu.ops import block_chol as bc
            Dblk, Eblk = bc.build_blocks(cfg, qp, h_s, scfg.sigma,
                                         rho_inner, D)
            perm = bc.flat_to_block_perm(cfg)

            def m_op(x):  # noqa: F811 — block-structured refinement operator
                return bc.block_apply(Dblk, Eblk, perm, x, n)

            def m_residual(rhs, x):
                return rhs - m_op(x)
        elif scfg.folded_refine:
            m_op = make_folded_m_op(cfg, qp, h_s, scfg.sigma, rho_inner, D)

            def m_residual(rhs, x):
                return rhs - m_op(x)
        else:
            def m_residual(rhs, x):
                return rhs - m_apply(x)

    try:
        custom_msolve = msolve_woodbury
    except NameError:
        custom_msolve = None

    warm_x0 = (factor is not None and scfg.shared_refine_mode == "cg"
               and scfg.shared_refine_x0 == "prev")

    def make_step(refine_k: int, ew: bool = False):
        def msolve_cg(rhs, x_init):
            # preconditioned CG on this candidate's normal system with the
            # shared Minv as preconditioner: per step the same two applies
            # as stationary refinement (one normal-operator, one Minv) but
            # Krylov-optimal step/conjugation scalars, and the initial
            # guess reuses the preconditioner apply (one fewer Minv read
            # per x-update than stationary at equal normal-op count).
            # With shared_refine_x0="prev" the initial guess is instead
            # the PREVIOUS ADMM iteration's x-tilde (passed in x_init):
            # the iterates drift slowly, so the guess is closer and the
            # initial Minv read is saved too (2 Minv applies per x-update
            # instead of 3 — the dominant HBM term, see the roofline).
            tiny = jnp.asarray(1e-30, Minv.dtype)
            if x_init is None:
                x = jnp.matmul(Minv, rhs, precision=_PREC)
            else:
                x = x_init
            r = m_residual(rhs, x)
            z = jnp.matmul(Minv, r, precision=_PREC)
            p = z
            rz = jnp.vdot(r, z)
            for j in range(refine_k):
                ap = m_op(p)
                pap = jnp.vdot(p, ap)
                a = jnp.where(jnp.abs(pap) > tiny, rz / pap, 0.0)
                x = x + a * p
                if j < refine_k - 1:
                    r = r - a * ap
                    z = jnp.matmul(Minv, r, precision=_PREC)
                    rz_n = jnp.vdot(r, z)
                    b = jnp.where(jnp.abs(rz) > tiny, rz_n / rz, 0.0)
                    rz = rz_n
                    p = z + b * p
            return x

        def msolve(rhs, x_init):
            if custom_msolve is not None:
                return custom_msolve(rhs)
            if scfg.shared_refine_mode == "cg" and refine_k > 0:
                return msolve_cg(rhs, x_init)
            x = jnp.matmul(Minv, rhs, precision=_PREC)
            for _ in range(refine_k):
                r = m_residual(rhs, x)
                x = x + jnp.matmul(Minv, r, precision=_PREC)
            return x

        if ew:
            # fused elementwise chain (ops/pallas_ew.py): the whole
            # relax/project/dual/x-blend chain plus the NEXT iteration's
            # rho*z - y in ONE kernel dispatch; the carry gains rzy so
            # the chain's tail feeds the next at_s directly
            from intent_mpc_tpu.ops.pallas_ew import ew_chain

            def step_ew(carry, _):
                x, z, y, xt_prev, rzy = carry
                rhs = sigma * x - q_s + at_s(rzy)
                x_t = msolve(rhs, xt_prev if warm_x0 else None)
                z_t = a_s(x_t)
                x_n, z_n, y_n, rzy_n = ew_chain(alpha, x, x_t, z, y, z_t,
                                                rho, l_s, u_s)
                return (x_n, z_n, y_n, x_t, rzy_n), None
            return step_ew

        def step(carry, _):
            x, z, y, xt_prev = carry
            rz_y = z.map(lambda zi, ri, yi: ri * zi - yi, rho, y)
            rhs = sigma * x - q_s + at_s(rz_y)
            x_t = msolve(rhs, xt_prev if warm_x0 else None)
            z_t = a_s(x_t)
            x_n = alpha * x_t + (1.0 - alpha) * x
            z_relax = z_t.map(lambda zt, zi: alpha * zt + (1.0 - alpha) * zi,
                              z)
            z_n = z_relax.map(
                lambda zr, yi, ri, li, ui: jnp.clip(zr + yi / ri, li, ui),
                y, rho, l_s, u_s)
            y_n = y.map(lambda yi, zr, zn, ri: yi + ri * (zr - zn),
                        z_relax, z_n, rho)
            return (x_n, z_n, y_n, x_t), None
        return step

    if x0 is None:
        x0 = jnp.zeros(n, jnp.float32)
    xs0 = x0 / D                 # to scaled space
    z0 = a_s(xs0)
    y0 = ConVec(*(jnp.zeros_like(a) for a in z0))

    sigma, alpha = scfg.sigma, scfg.alpha
    iters = max_iter if max_iter is not None else scfg.max_iter

    if scfg.adaptive_rho and factor is None:
        return _solve_adaptive(cfg, qp, scfg, hdiag, D, E, c, h_s, q_s,
                               l_s, u_s, a_s, at_s, xs0, z0, y0, iters,
                               rho_base, feas_tol)

    # optional two-phase refinement with a shared factor: cheap x-updates
    # while the compromise iterate is far from settled, full refinement
    # for the tail that shapes the executed trajectory
    warm = int(iters * scfg.shared_refine_warm_frac) \
        if factor is not None else 0
    if scfg.truncation == "osqp":
        # OSQP-termination emulation (opt-in, VERDICT r3 item 3b): iterate
        # in check_termination-sized blocks; a problem that satisfies
        # OSQP's unscaled eps_abs/eps_rel test FREEZES at that iterate
        # (what osqp_solve would have returned), others continue to the
        # max_iter cap (the 0.05 s time-limit analogue,
        # mpcPlanner.cpp:442-444 + OsqpEigen Solver.hpp). Under vmap the
        # while_loop runs until every lane terminates — a throughput
        # trade, which is why "fixed" stays the default.
        step_fn = make_step(refine)
        blk = scfg.term_check_interval
        # stop exactly at the max_iter cap like OSQP: full blocks run in
        # the while loop, a remainder block (iters % blk) runs once after
        # it for the lanes that never converged (ADVICE r4: without the
        # clamp, total iterations = ceil(iters/blk)*blk overran the cap)
        nfull = (iters // blk) * blk

        def _converged(xs, zs, ys):
            x = D * xs
            y = ys.scale(E).map(lambda v: v / c)
            z = zs.map(lambda zi, ei: zi / ei, E)
            ax = qplib.a_matvec(cfg, qp, x)
            prim_r = (ax - z).inf_norm()
            aty = qplib.at_matvec(cfg, qp, y)
            dual_r = jnp.max(jnp.abs(hdiag * x + qp.q + aty))
            eps_p = scfg.eps_abs + scfg.eps_rel * jnp.maximum(
                ax.inf_norm(), z.inf_norm())
            eps_d = scfg.eps_abs + scfg.eps_rel * jnp.maximum(
                jnp.max(jnp.abs(hdiag * x)),
                jnp.maximum(jnp.max(jnp.abs(aty)), jnp.max(jnp.abs(qp.q))))
            return (prim_r < eps_p) & (dual_r < eps_d)

        def w_cond(state):
            _, k, done = state
            return (~done) & (k < nfull)

        def w_body(state):
            carry, k, done = state
            new_carry, _ = jax.lax.scan(step_fn, carry, None, length=blk)
            carry = jax.tree.map(lambda nv, ov: jnp.where(done, ov, nv),
                                 new_carry, carry)
            xs_k, zs_k, ys_k, _ = carry
            return carry, k + blk, done | _converged(xs_k, zs_k, ys_k)

        (carry, _, done) = jax.lax.while_loop(
            w_cond, w_body, ((xs0, z0, y0, xs0),
                             jnp.asarray(0, jnp.int32), jnp.asarray(False)))
        rem = iters - nfull
        if rem > 0:
            new_carry, _ = jax.lax.scan(step_fn, carry, None, length=rem)
            carry = jax.tree.map(lambda nv, ov: jnp.where(done, ov, nv),
                                 new_carry, carry)
        xs, zs, ys, _ = carry
    elif (factor is not None and scfg.flat_iter and custom_msolve is None
            and not scfg.block_refine and not scfg.folded_refine
            and warm == 0):
        # flat-constraint-space iteration (see _solve_flat): same math,
        # ~4x fewer ops per iteration
        xs, zs, ys = _solve_flat(cfg, qp, scfg, factor, D, E, c, h_s,
                                 q_s, rho, xs0, iters)
    elif scfg.ew_kernel and custom_msolve is None and warm == 0:
        rzy0 = z0.map(lambda zi, ri, yi: ri * zi - yi, rho, y0)
        carry = (xs0, z0, y0, xs0, rzy0)
        carry, _ = jax.lax.scan(make_step(refine, ew=True), carry, None,
                                length=iters)
        xs, zs, ys = carry[0], carry[1], carry[2]
    else:
        carry = (xs0, z0, y0, xs0)
        if warm > 0:
            carry, _ = jax.lax.scan(make_step(scfg.shared_refine_warm),
                                    carry, None, length=warm)
        carry, _ = jax.lax.scan(make_step(refine), carry, None,
                                length=iters - warm)
        (xs, zs, ys, _) = carry

    # unscale
    x = D * xs
    y = ys.scale(E).map(lambda v: v / c)
    z = zs.map(lambda zi, ei: zi / ei, E)

    ax = qplib.a_matvec(cfg, qp, x)
    prim = (ax - z).inf_norm()
    aty = qplib.at_matvec(cfg, qp, y)
    dual_vec = hdiag * x + qp.q + aty
    dual = jnp.max(jnp.abs(dual_vec))

    # OSQP adaptive-rho suggestion from scaled relative residuals
    prim_rel = prim / jnp.maximum(jnp.maximum(ax.inf_norm(), z.inf_norm()),
                                  1e-10)
    dual_rel = dual / jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(hdiag * x)),
                    jnp.maximum(jnp.max(jnp.abs(aty)),
                                jnp.max(jnp.abs(qp.q)))), 1e-10)
    ratio = jnp.sqrt(prim_rel / jnp.maximum(dual_rel, 1e-12))
    do_adapt = (ratio > 5.0) | (ratio < 0.2)
    rho_next = jnp.where(do_adapt,
                         jnp.clip(rho_base * ratio, 1e-4, 1e3), rho_base)
    return ADMMResult(x=x, y=y, prim_res=prim, dual_res=dual,
                      solved=prim < feas_tol,
                      rho_suggest=jnp.asarray(rho_next))


def _solve_adaptive(cfg, qp, scfg, hdiag, D, E, c, h_s, q_s, l_s, u_s,
                    a_s, at_s, xs0, z0, y0, iters, rho_base, feas_tol):
    """OSQP's in-solve adaptive rho with refactorization: run blocks of
    `adapt_interval` iterations; after each block compare the relative
    primal/dual residuals (OSQP adapt_rho semantics, mirrored by the
    oracle at numpy_ref.py:208-221 and native/qp_solver.cpp:210-235),
    rescale rho by sqrt(prim_rel/dual_rel) outside [0.2, 5], and
    refactorize. The factorization rides the structured block Cholesky
    (ops/block_chol.py), so a refactor costs O(H*13^3) — cheap enough
    to run traced under lax.cond every block."""
    n = cfg.num_vars
    sigma, alpha = scfg.sigma, scfg.alpha
    interval = scfg.adapt_interval
    n_blocks = max(iters // interval, 1)

    def factor_for(rho_b):
        rho = qplib.rho_vec(cfg, qp, rho_b, scfg.rho_eq_scale)
        rho_inner = rho.map(lambda r, e: r * e * e, E)
        return _explicit_minv(cfg, qp, h_s, scfg, rho_inner, D), rho

    Minv0, rho0 = factor_for(rho_base)

    def iteration(carry, rho, Minv):
        x, z, y = carry
        rz_y = z.map(lambda zi, ri, yi: ri * zi - yi, rho, y)
        rhs = sigma * x - q_s + at_s(rz_y)
        x_t = jnp.matmul(Minv, rhs, precision=_PREC)
        for _ in range(scfg.refine_iters):
            r = rhs - (h_s * x_t + sigma * x_t + at_s(a_s(x_t).map(
                lambda a, ri: a * ri, rho)))
            x_t = x_t + jnp.matmul(Minv, r, precision=_PREC)
        z_t = a_s(x_t)
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_relax = z_t.map(lambda zt, zi: alpha * zt + (1.0 - alpha) * zi, z)
        z_n = z_relax.map(
            lambda zr, yi, ri, li, ui: jnp.clip(zr + yi / ri, li, ui),
            y, rho, l_s, u_s)
        y_n = y.map(lambda yi, zr, zn, ri: yi + ri * (zr - zn),
                    z_relax, z_n, rho)
        return (x_n, z_n, y_n)

    def block(carry, _):
        x, z, y, rho_b, Minv = carry
        rho = qplib.rho_vec(cfg, qp, rho_b, scfg.rho_eq_scale)

        def inner(c2, _):
            return iteration(c2, rho, Minv), None
        (x, z, y), _ = jax.lax.scan(inner, (x, z, y), None,
                                    length=interval)

        # scaled relative residuals (OSQP adapt rule)
        ax = a_s(x)
        prim = (ax - z).inf_norm()
        aty = at_s(y)
        dual = jnp.max(jnp.abs(h_s * x + q_s + aty))
        prim_rel = prim / jnp.maximum(
            jnp.maximum(ax.inf_norm(), z.inf_norm()), 1e-10)
        dual_rel = dual / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(h_s * x)),
                        jnp.maximum(jnp.max(jnp.abs(aty)),
                                    jnp.max(jnp.abs(q_s)))), 1e-10)
        ratio = jnp.sqrt(prim_rel / jnp.maximum(dual_rel, 1e-12))
        do_adapt = (ratio > 5.0) | (ratio < 0.2)
        rho_new = jnp.where(do_adapt,
                            jnp.clip(rho_b * ratio, 1e-6, 1e6), rho_b)

        Minv2 = jax.lax.cond(
            do_adapt,
            lambda rb: factor_for(rb)[0],
            lambda rb: Minv,
            rho_new)
        # rescale duals to keep y/rho continuous across the rho switch?
        # OSQP keeps y as-is (rho enters the iteration directly) — same.
        return (x, z, y, rho_new, Minv2), None

    carry0 = (xs0, z0, y0, jnp.asarray(rho_base, jnp.float32), Minv0)
    (xs, zs, ys, rho_fin, _), _ = jax.lax.scan(block, carry0, None,
                                               length=n_blocks)

    x = D * xs
    y = ys.scale(E).map(lambda v: v / c)
    ax = qplib.a_matvec(cfg, qp, x)
    z_clip = ax.map(lambda a, li, ui: jnp.clip(a, li, ui), qp.l, qp.u)
    prim = (ax - z_clip).inf_norm()
    aty = qplib.at_matvec(cfg, qp, y)
    dual = jnp.max(jnp.abs(hdiag * x + qp.q + aty))
    return ADMMResult(x=x, y=y, prim_res=prim, dual_res=dual,
                      solved=prim < feas_tol,
                      rho_suggest=rho_fin)


@partial(jax.jit, static_argnums=(0, 2))
def admm_solve_batch(cfg: PlannerConfig, qps: QPData, max_iter: int,
                     x0: jnp.ndarray) -> ADMMResult:
    """vmapped solve over a leading candidate/batch axis."""
    return jax.vmap(lambda q, x: admm_solve(cfg, q, x, max_iter))(qps, x0)


# ---------------------------------------------------------------------------
# Pallas-fused path: setup (scaling / factorization / dense-A
# materialization) in XLA, the iteration loop in a VMEM-resident kernel
# (ops/pallas_admm.py).
# ---------------------------------------------------------------------------

def _dense_scaled_problem(cfg: PlannerConfig, qp: QPData, x0,
                          scfg: SolverConfig, n_pad: int, m_pad: int):
    """Per-candidate kernel inputs: Ruiz scaling applied to the dense A."""
    import intent_mpc_tpu.ops.pallas_admm as pk

    n = cfg.num_vars
    hdiag = qplib.hessian_diag(cfg)
    sc = ruiz_equilibrate(cfg, qp, hdiag, scfg.scaling_iters)
    D, E, c = sc.D, sc.E, sc.c
    h_s = c * D * D * hdiag
    q_s = c * D * qp.q
    rho = qplib.rho_vec(cfg, qp, scfg.rho, scfg.rho_eq_scale)
    rho_inner = rho.map(lambda r, e: r * e * e, E)
    M = qplib.assemble_normal_matrix(cfg, qp, h_s, scfg.sigma, rho_inner,
                                     col_scale=D)
    # same Minv construction as the XLA path (structured block-tridiagonal
    # factorization by default) so both paths share iterate trajectories
    Minv = _explicit_minv(cfg, qp, h_s, scfg, rho_inner, D)

    A = qplib.dense_a_matrix(cfg, qp)                # (m, n) unscaled
    e_flat = qplib.con_to_flat(E)
    A_s = e_flat[:, None] * A * D[None, :]
    m = A.shape[0]

    def pad_mat(Mx):
        out = jnp.eye(n_pad, dtype=Mx.dtype)
        return out.at[:n, :n].set(Mx)

    A_pad = jnp.zeros((m_pad, n_pad), A.dtype).at[:m, :n].set(A_s)
    rho_flat = jnp.full(m_pad, 1e-6).at[:m].set(qplib.con_to_flat(rho))
    lo = jnp.full(m_pad, -jnp.inf).at[:m].set(
        qplib.con_to_flat(qp.l.scale(E)))
    hi = jnp.full(m_pad, jnp.inf).at[:m].set(
        qplib.con_to_flat(qp.u.scale(E)))

    def col(v, size):
        return jnp.zeros((size, 1), v.dtype).at[: v.shape[0], 0].set(v)

    return pk.DenseScaledProblem(
        minv=pad_mat(Minv), mmat=pad_mat(M), amat=A_pad,
        q=col(q_s, n_pad), x0=col(x0 / D, n_pad),
        rho=rho_flat[:, None], lo=lo[:, None], hi=hi[:, None]), (D, E, c)


def admm_solve_pallas(cfg: PlannerConfig, qps: QPData, x0: jnp.ndarray,
                      max_iter: Optional[int] = None,
                      scfg: Optional[SolverConfig] = None,
                      feas_tol: float = 5e-2,
                      interpret: bool = False) -> ADMMResult:
    """Batched solve with the fused Pallas iteration kernel. qps/x0 carry a
    leading candidate axis. Problems whose dense A exceeds the VMEM budget
    should use the XLA path instead (admm_solve_batch).

    Dual outputs are unavailable on this path: the returned ADMMResult has
    y and dual_res set to NaN (primal x / prim_res / solved are real)."""
    import intent_mpc_tpu.ops.pallas_admm as pk

    scfg = scfg or cfg.solver
    iters = max_iter if max_iter is not None else scfg.max_iter
    n = cfg.num_vars
    H, W = cfg.horizon, cfg.mpc_window
    K = qps.G.shape[2]
    m = 2 * 8 * H + 5 * W + K * W
    n_pad = ((n + 127) // 128) * 128
    m_pad = ((m + 127) // 128) * 128

    sp, scales = jax.vmap(
        lambda q, x: _dense_scaled_problem(cfg, q, x, scfg, n_pad, m_pad)
    )(qps, x0)
    xs = pk.admm_iterations_dense(sp, iters, scfg.sigma, scfg.alpha,
                                  refine=scfg.refine_iters,
                                  interpret=interpret)
    D, E, c = scales
    x = D * xs[:, :n]

    def residuals(qp, xi):
        ax = qplib.a_matvec(cfg, qp, xi)
        z = ax.map(lambda a, li, ui: jnp.clip(a, li, ui), qp.l, qp.u)
        return (ax - z).inf_norm()

    prim = jax.vmap(residuals)(qps, x)
    # The kernel does not return duals: mark y and dual_res NaN so a caller
    # comparing dual fields against the XLA path fails loudly instead of
    # silently reading zeros.
    y_nan = jax.vmap(lambda q, xi: ConVec(*(jnp.full_like(a, jnp.nan) for a in
                                            qplib.a_matvec(cfg, q, xi))))(qps, x)
    return ADMMResult(x=x, y=y_nan, prim_res=prim,
                      dual_res=jnp.full_like(prim, jnp.nan),
                      solved=prim < feas_tol,
                      rho_suggest=jnp.full_like(prim, scfg.rho))

"""Structured MPC-QP assembly (TPU-native, no sparse inserts).

The reference casts the MPC to a sparse OSQP problem with Eigen triplet
inserts (trajectory_planner/mpcPlanner.cpp:891-1146). Here the QP is kept
*structured*: the decision vector is (X: (H,8) states, U: (W,5) controls)
and the constraint space is a pytree of fixed-shape groups:

    eq  (H,8):  -x_0 ;  A x_{i-1} + B u_{i-1} - x_i        (dynamics equality)
    sb  (H,8):  x_i                                         (state bounds)
    cb  (W,5):  u_i                                         (control bounds)
    obs (W,K):  g_{ik}.p_i - s_{ik}                         (linearized ellipsoids)

Matvecs with A and A^T are closed-form shifts/einsums; the normal matrix
M = P + sigma I + A^T rho A needed by the ADMM x-update is assembled densely
from per-step block contributions (scatter into (n,n)), then factorized once
per solve with a batched Cholesky. Everything is fixed-shape: inactive
obstacle slots carry zero gradients and (-inf, +inf) bounds.

State/control model (mpcPlanner.cpp:891-921):
  x = (px,py,pz, vx,vy,vz, d1,d2), u = (ax,ay,az, sk_d, sk_s)
  A = [[I, ts I, 0],[0, I, 0],[0,0,0]],  B = [[ts^2/2 I, 0],[ts I, 0],[0, I2]]
(the two "dummy" states carry the previous step's slack controls and are
quadratically penalized with weights (100, 1000)).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from intent_mpc_tpu.utils.config import PlannerConfig

INF = jnp.inf
PREC = jax.lax.Precision.HIGHEST  # keep MXU contractions in full f32
NX = 8
NU = 5


class ConVec(NamedTuple):
    """A vector in constraint space, stored per group."""

    eq: jnp.ndarray   # (H, 8)
    sb: jnp.ndarray   # (H, 8)
    cb: jnp.ndarray   # (W, 5)
    obs: jnp.ndarray  # (W, K)

    def __add__(self, o):
        return ConVec(*(a + b for a, b in zip(self, o)))

    def __sub__(self, o):
        return ConVec(*(a - b for a, b in zip(self, o)))

    def scale(self, s):
        return ConVec(*(a * b for a, b in zip(self, s)))

    def map(self, f, *others):
        return ConVec(*(f(a, *bs) for a, *bs in zip(self, *others)))

    def inf_norm(self):
        return jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(self.eq)), jnp.max(jnp.abs(self.sb))),
            jnp.maximum(jnp.max(jnp.abs(self.cb)), jnp.max(jnp.abs(self.obs))))


class QPData(NamedTuple):
    """Per-solve (per-candidate) QP problem data. All arrays fixed-shape.

    The obs group also carries FOV half-space rows (updateFovParam,
    mpcPlanner.cpp:274-295): linear rows on (x, y) with NO slack column —
    obs_slack = 0 for those slots."""

    q: jnp.ndarray          # (n,) linear cost
    l: ConVec               # lower bounds
    u: ConVec               # upper bounds
    G: jnp.ndarray          # (W, K, 3) obstacle constraint gradients
    obs_dyn: jnp.ndarray    # (W, K) 1.0 if row uses dynamic slack u[3], else u[4]
    obs_active: jnp.ndarray  # (W, K) 1.0 for live obstacle rows
    obs_slack: jnp.ndarray  # (W, K) 1.0 if the row has a slack column


def dynamics_matrices(ts: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """A (8,8), B (8,5) per mpcPlanner::setDynamicsMatrices (mpcPlanner.cpp:891-901)."""
    A = jnp.zeros((NX, NX))
    A = A.at[0:3, 0:3].set(jnp.eye(3))
    A = A.at[0:3, 3:6].set(jnp.eye(3) * ts)
    A = A.at[3:6, 3:6].set(jnp.eye(3))
    B = jnp.zeros((NX, NU))
    B = B.at[0:3, 0:3].set(jnp.eye(3) * 0.5 * ts * ts)
    B = B.at[3:6, 0:3].set(jnp.eye(3) * ts)
    B = B.at[6:8, 3:5].set(jnp.eye(2))
    return A, B


def cost_diagonals(cfg: PlannerConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Q (8,), R (5,) diagonals per setWeightMatrices (mpcPlanner.cpp:925-931)."""
    Q = jnp.array([cfg.position_weight] * 3 + [cfg.velocity_weight] * 3
                  + list(cfg.dummy_state_weights))
    R = jnp.array([cfg.acceleration_weight] * 3 + list(cfg.slack_control_weights))
    return Q, R


def hessian_diag(cfg: PlannerConfig) -> jnp.ndarray:
    """Block-diagonal Hessian is fully diagonal (castMPCToQPHessian)."""
    Q, R = cost_diagonals(cfg)
    H, W = cfg.horizon, cfg.mpc_window
    return jnp.concatenate([jnp.tile(Q, H), jnp.tile(R, W)])


def state_control_bounds(cfg: PlannerConfig):
    """Per setInequalityConstraints (mpcPlanner.cpp:904-921)."""
    x_min = jnp.array([-INF, cfg.y_range[0], cfg.z_range[0],
                       -cfg.max_vel, -cfg.max_vel, -cfg.max_vel, -INF, -INF])
    x_max = jnp.array([INF, cfg.y_range[1], cfg.z_range[1],
                       cfg.max_vel, cfg.max_vel, cfg.max_vel, INF, INF])
    skd = 1.0 - (1.0 - cfg.dynamic_slack) ** 2
    sks = 1.0 - (1.0 - cfg.static_slack) ** 2
    u_min = jnp.array([-cfg.max_acc] * 3 + [0.0, 0.0])
    u_max = jnp.array([cfg.max_acc] * 3 + [skd, sks])
    return x_min, x_max, u_min, u_max


def split_z(z: jnp.ndarray, cfg: PlannerConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    H, W = cfg.horizon, cfg.mpc_window
    X = z[: NX * H].reshape(H, NX)
    U = z[NX * H:].reshape(W, NU)
    return X, U


def merge_z(X: jnp.ndarray, U: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([X.reshape(-1), U.reshape(-1)])


def linearize_obstacles(oxyz: jnp.ndarray, osize: jnp.ndarray, yaw: jnp.ndarray,
                        c: jnp.ndarray):
    """Linearized rotated-ellipsoid keep-out constraints.

    f(p) = ((dx cy + dy sy)/sx)^2 + ((-dx sy + dy cy)/sy_ax)^2 + (dz/sz)^2 >= 1
    linearized at c (the previous solution / current position), matching
    castMPCToQPConstraintMatrix / castMPCToQPConstraintVectors
    (mpcPlanner.cpp:1040-1071, 1119-1139).

    Args: oxyz (W,K,3) centers, osize (W,K,3) semi-axes, yaw (W,K),
          c (W,3) linearization points.
    Returns: G (W,K,3) gradients, lo (W,K) lower bounds = 1 - f(c) + G.c
    """
    d = c[:, None, :] - oxyz                      # (W,K,3)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    e1 = (d[..., 0] * cy + d[..., 1] * sy) / osize[..., 0] ** 2
    e2 = (-d[..., 0] * sy + d[..., 1] * cy) / osize[..., 1] ** 2
    gx = 2.0 * (e1 * cy - e2 * sy)
    gy = 2.0 * (e1 * sy + e2 * cy)
    gz = 2.0 * d[..., 2] / osize[..., 2] ** 2
    G = jnp.stack([gx, gy, gz], axis=-1)
    f = (e1 * (d[..., 0] * cy + d[..., 1] * sy)
         + e2 * (-d[..., 0] * sy + d[..., 1] * cy)
         + (d[..., 2] / osize[..., 2]) ** 2)
    lo = 1.0 - f + jnp.einsum("wkd,wd->wk", G, c, precision=PREC)
    return G, lo


def build_qp(cfg: PlannerConfig, x0: jnp.ndarray, xref: jnp.ndarray,
             oxyz: jnp.ndarray, osize: jnp.ndarray, yaw: jnp.ndarray,
             obs_dyn: jnp.ndarray, obs_active: jnp.ndarray,
             lin_states: jnp.ndarray,
             fov_rows=None) -> QPData:
    """Assemble the full QP for one candidate.

    Args:
      x0:        (6,) current [pos, vel]
      xref:      (H,3) reference positions (getXRef, mpcPlanner.cpp:968-981)
      oxyz:      (W,K,3) obstacle centers per step
      osize:     (W,K,3) obstacle semi-axes (bbox/2 + safety, updateObstacleParam)
      yaw:       (W,K) obstacle yaw
      obs_dyn:   (W,K) 1.0 -> dynamic slack u[3], 0.0 -> static slack u[4]
      obs_active:(W,K) row live mask
      lin_states:(W,3) linearization positions (prev solution or currPos)
    """
    H, W, K = cfg.horizon, cfg.mpc_window, oxyz.shape[1]
    Q, _ = cost_diagonals(cfg)

    # gradient: q_state[i] = -Q * xref8[i]; controls part zero (mpcPlanner.cpp:952-966)
    xref8 = jnp.zeros((H, NX)).at[:, 0:3].set(xref)
    q = jnp.concatenate([(-(Q[None, :] * xref8)).reshape(-1), jnp.zeros(W * NU)])

    # equality rows: l = u = [-x0_full, 0, ...] (castMPCToQPConstraintVectors:1082-1086)
    x0_full = jnp.zeros(NX).at[0:6].set(x0)
    beq = jnp.zeros((H, NX)).at[0].set(-x0_full)

    x_min, x_max, u_min, u_max = state_control_bounds(cfg)
    G, lo = linearize_obstacles(oxyz, osize, yaw, lin_states)
    # inactive slots: zero gradient, (-inf, inf) bounds -> loose rows
    G = G * obs_active[..., None]
    lo = jnp.where(obs_active > 0, lo, -INF)

    hi = jnp.full((W, K), INF)
    slack_mask = jnp.ones((W, K))
    if fov_rows is not None:
        # two extra no-slack rows per step (updateFovParam): row 1:
        # a1 x + b1 y <= c1; row 2: a2 x + b2 y >= c2. Caller must size K
        # with two spare slots (the last two) for these.
        half_max, half_min = fov_rows      # each (3,): a, b, c
        G = G.at[:, K - 2, 0].set(half_max[0]).at[:, K - 2, 1].set(half_max[1])
        G = G.at[:, K - 1, 0].set(half_min[0]).at[:, K - 1, 1].set(half_min[1])
        lo = lo.at[:, K - 2].set(-INF).at[:, K - 1].set(half_min[2])
        hi = hi.at[:, K - 2].set(half_max[2])
        obs_active = obs_active.at[:, K - 2:].set(1.0)
        slack_mask = slack_mask.at[:, K - 2:].set(0.0)

    l = ConVec(eq=beq, sb=jnp.broadcast_to(x_min, (H, NX)),
               cb=jnp.broadcast_to(u_min, (W, NU)), obs=lo)
    u = ConVec(eq=beq, sb=jnp.broadcast_to(x_max, (H, NX)),
               cb=jnp.broadcast_to(u_max, (W, NU)), obs=hi)
    return QPData(q=q, l=l, u=u, G=G, obs_dyn=obs_dyn * obs_active,
                  obs_active=obs_active, obs_slack=slack_mask)


# ---------------------------------------------------------------------------
# Structured matvecs
# ---------------------------------------------------------------------------

def a_matvec(cfg: PlannerConfig, qp: QPData, z: jnp.ndarray) -> ConVec:
    """A @ z in constraint-group space (closed-form, no sparse matrix)."""
    ts = cfg.ts
    X, U = split_z(z, cfg)
    p, v, d = X[:, 0:3], X[:, 3:6], X[:, 6:8]
    a, s = U[:, 0:3], U[:, 3:5]

    # eq rows: eq[0] = -x_0 ; eq[i] = A x_{i-1} + B u_{i-1} - x_i
    nxt_p = p[:-1] + ts * v[:-1] + 0.5 * ts * ts * a - p[1:]
    nxt_v = v[:-1] + ts * a - v[1:]
    nxt_d = s - d[1:]
    eq = jnp.concatenate([
        -X[0:1],
        jnp.concatenate([nxt_p, nxt_v, nxt_d], axis=-1),
    ], axis=0)

    sb = X
    cb = U
    slack = qp.obs_dyn * U[:, 3:4] + (1.0 - qp.obs_dyn) * U[:, 4:5]
    slack = slack * qp.obs_slack
    # obs row (i,k): G . p_i - s_i  (note: state index i, 0..W-1; mpcPlanner.cpp:1061-1069)
    obs = jnp.einsum("wkd,wd->wk", qp.G, p[:-1], precision=PREC) - slack * qp.obs_active
    return ConVec(eq=eq, sb=sb, cb=cb, obs=obs)


def at_matvec(cfg: PlannerConfig, qp: QPData, w: ConVec) -> jnp.ndarray:
    """A^T @ w back to decision space."""
    ts = cfg.ts
    H, W = cfg.horizon, cfg.mpc_window
    Xg = jnp.zeros((H, NX))
    Ug = jnp.zeros((W, NU))

    # eq rows
    weq = w.eq
    Xg = Xg.at[0].add(-weq[0])
    # A^T contribution to x_{i-1} from row i (i>=1): A^T weq[i]
    wn = weq[1:]                                   # (W,8)
    atw = jnp.concatenate([
        wn[:, 0:3],
        ts * wn[:, 0:3] + wn[:, 3:6],
        jnp.zeros((W, 2)),
    ], axis=-1)
    Xg = Xg.at[:-1].add(atw)
    Xg = Xg.at[1:].add(-wn)                        # -I on x_i
    btw = jnp.concatenate([
        0.5 * ts * ts * wn[:, 0:3] + ts * wn[:, 3:6],
        wn[:, 6:8],
    ], axis=-1)
    Ug = Ug + btw

    # bound rows (identity)
    Xg = Xg + w.sb
    Ug = Ug + w.cb

    # obstacle rows
    wobs = w.obs * qp.obs_active                   # (W,K)
    Xg = Xg.at[:-1, 0:3].add(jnp.einsum("wk,wkd->wd", wobs, qp.G, precision=PREC))
    ws = wobs * qp.obs_slack
    Ug = Ug.at[:, 3].add(-jnp.sum(ws * qp.obs_dyn, axis=-1))
    Ug = Ug.at[:, 4].add(-jnp.sum(ws * (1.0 - qp.obs_dyn), axis=-1))
    return merge_z(Xg, Ug)


def rho_vec(cfg: PlannerConfig, qp: QPData, rho: float, rho_eq_scale: float,
            rho_min: float = 1e-6) -> ConVec:
    """Per-row ADMM penalty, mirroring OSQP's compute_rho_vec:
    equality rows (l==u) get rho*1e3; loose rows (both bounds infinite)
    get rho_min; the rest get rho."""
    H, W = cfg.horizon, cfg.mpc_window
    K = qp.G.shape[1]
    eq = jnp.full((H, NX), rho * rho_eq_scale)
    loose_sb = jnp.isinf(qp.l.sb) & jnp.isinf(qp.u.sb)
    sb = jnp.where(loose_sb, rho_min, rho)
    cb = jnp.full((W, NU), rho)
    obs = jnp.where(qp.obs_active > 0, rho, rho_min)
    return ConVec(eq=eq, sb=sb, cb=cb, obs=obs)


# ---------------------------------------------------------------------------
# Structured row/column abs-max norms (for OSQP-style Ruiz equilibration)
# ---------------------------------------------------------------------------

def a_rowmax(cfg: PlannerConfig, qp: QPData, D: jnp.ndarray) -> ConVec:
    """Per-row max_j |A_ij| * D_j of the column-scaled constraint matrix."""
    A, B = dynamics_matrices(cfg.ts)
    Dx, Du = split_z(D, cfg)
    # eq row 0: single -1 on x_0
    r0 = Dx[0:1]
    # eq rows i>=1: -1 on x_i, A on x_{i-1}, B on u_{i-1}
    mA = jnp.max(jnp.abs(A)[None] * Dx[:-1, None, :], axis=-1)   # (W,8)
    mB = jnp.max(jnp.abs(B)[None] * Du[:, None, :], axis=-1)     # (W,8)
    ri = jnp.maximum(Dx[1:], jnp.maximum(mA, mB))
    eq = jnp.concatenate([r0, ri], axis=0)
    sb = Dx
    cb = Du
    gmax = jnp.max(jnp.abs(qp.G) * Dx[:-1, None, 0:3], axis=-1)  # (W,K)
    du_slack = (qp.obs_dyn * Du[:, 3:4]
                + (1.0 - qp.obs_dyn) * Du[:, 4:5]) * qp.obs_slack
    obs = jnp.maximum(gmax, du_slack) * qp.obs_active
    return ConVec(eq=eq, sb=sb, cb=cb, obs=obs)


def a_colmax(cfg: PlannerConfig, qp: QPData, E: ConVec) -> jnp.ndarray:
    """Per-column max_i E_i |A_ij| of the row-scaled constraint matrix."""
    A, B = dynamics_matrices(cfg.ts)
    H, W = cfg.horizon, cfg.mpc_window
    # x columns
    cx = E.eq                                            # -1 entries (H,8)
    viaA = jnp.max(jnp.abs(A)[None] * E.eq[1:, :, None], axis=1)   # (W,8) col j
    cx = cx.at[:-1].max(viaA)
    cx = jnp.maximum(cx, E.sb)
    eobs = E.obs * qp.obs_active                          # (W,K)
    gcol = jnp.max(jnp.abs(qp.G) * eobs[..., None], axis=1)        # (W,3)
    cx = cx.at[:-1, 0:3].max(gcol)
    # u columns
    cu = jnp.max(jnp.abs(B)[None] * E.eq[1:, :, None], axis=1)     # (W,5)
    cu = jnp.maximum(cu, E.cb)
    es = eobs * qp.obs_slack
    cu = cu.at[:, 3].max(jnp.max(es * qp.obs_dyn, axis=-1))
    cu = cu.at[:, 4].max(jnp.max(es * (1.0 - qp.obs_dyn), axis=-1))
    return merge_z(cx, cu)


# ---------------------------------------------------------------------------
# Dense normal-matrix assembly: M = diag(h) + sigma I + A^T diag(rho) A
# ---------------------------------------------------------------------------

def assemble_normal_matrix(cfg: PlannerConfig, qp: QPData, hdiag: jnp.ndarray,
                           sigma: float, rho: ConVec,
                           col_scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """Build M (n,n) from closed-form block contributions.

    With `col_scale` D given, returns diag(hdiag + sigma) + D (A^T rho A) D —
    i.e. the normal matrix of the Ruiz-scaled problem when hdiag/rho are the
    scaled cost diagonal and per-row penalties (rho already includes E^2).
    """
    ts = cfg.ts
    H, W = cfg.horizon, cfg.mpc_window
    n = cfg.num_vars
    A, B = dynamics_matrices(ts)

    M = jnp.zeros((n, n))

    # --- identity bound rows contribute diag(rho_sb), diag(rho_cb)
    diag_add = jnp.concatenate([rho.sb.reshape(-1), rho.cb.reshape(-1)])
    M = M + jnp.diag(diag_add)

    # --- equality rows ---
    # row 0: -x_0 -> rho_eq[0] on x0 diag
    M = M.at[jnp.arange(NX), jnp.arange(NX)].add(rho.eq[0])

    r = rho.eq[1:]                                     # (W,8) per-row weights
    # blocks per step i (0..W-1): indices x_{i}=8i, u_i=8H+5i, x_{i+1}=8(i+1)
    AtrA = jnp.einsum("ja,wj,jb->wab", A, r, A, precision=PREC)        # (W,8,8)
    AtrB = jnp.einsum("ja,wj,jb->wab", A, r, B, precision=PREC)        # (W,8,5)
    BtrB = jnp.einsum("ja,wj,jb->wab", B, r, B, precision=PREC)        # (W,5,5)
    AtrI = jnp.einsum("ja,wj->waj", A, r, precision=PREC)              # (W,8,8): -A^T rho to x_{i+1}
    BtrI = jnp.einsum("ja,wj->waj", B, r, precision=PREC)              # (W,5,8)

    xi = NX * jnp.arange(W)                            # start index of x_i
    xo = NX * (jnp.arange(W) + 1)                      # start of x_{i+1}
    ui = NX * H + NU * jnp.arange(W)

    ax8 = jnp.arange(NX)
    ax5 = jnp.arange(NU)

    def scat(Mat, rows0, cols0, blocks, nr, nc):
        rr = rows0[:, None, None] + jnp.arange(nr)[None, :, None]
        cc = cols0[:, None, None] + jnp.arange(nc)[None, None, :]
        return Mat.at[rr, cc].add(blocks)

    M = scat(M, xi, xi, AtrA, NX, NX)
    M = scat(M, xi, ui, AtrB, NX, NU)
    M = scat(M, ui, xi, jnp.swapaxes(AtrB, 1, 2), NU, NX)
    M = scat(M, ui, ui, BtrB, NU, NU)
    M = scat(M, xi, xo, -AtrI, NX, NX)
    M = scat(M, xo, xi, -jnp.swapaxes(AtrI, 1, 2), NX, NX)
    M = scat(M, ui, xo, -BtrI, NU, NX)
    M = scat(M, xo, ui, -jnp.swapaxes(BtrI, 1, 2), NX, NU)
    # x_{i+1} diagonal: + rho I
    rr = xo[:, None] + ax8[None, :]
    M = M.at[rr, rr].add(r)

    # --- obstacle rows: per (i,k) outer product of [g; -e_slack] ---
    ro = rho.obs * qp.obs_active                       # (W,K)
    Gw = qp.G                                          # (W,K,3)
    # pos-pos 3x3 blocks
    PP = jnp.einsum("wk,wka,wkb->wab", ro, Gw, Gw, precision=PREC)     # (W,3,3)
    M = scat(M, xi, xi, PP, 3, 3)
    # slack diag at u_i[3] / u_i[4] (rows with a slack column only)
    rs = ro * qp.obs_slack
    sd = jnp.sum(rs * qp.obs_dyn, axis=-1)             # (W,)
    ss = jnp.sum(rs * (1.0 - qp.obs_dyn), axis=-1)
    M = M.at[ui + 3, ui + 3].add(sd)
    M = M.at[ui + 4, ui + 4].add(ss)
    # pos-slack cross: -rho g per slack column
    cd = -jnp.einsum("wk,wka->wa", rs * qp.obs_dyn, Gw, precision=PREC)          # (W,3)
    cs = -jnp.einsum("wk,wka->wa", rs * (1.0 - qp.obs_dyn), Gw, precision=PREC)  # (W,3)
    rr3 = xi[:, None] + jnp.arange(3)[None, :]
    M = M.at[rr3, (ui + 3)[:, None]].add(cd)
    M = M.at[(ui + 3)[:, None], rr3].add(cd)
    M = M.at[rr3, (ui + 4)[:, None]].add(cs)
    M = M.at[(ui + 4)[:, None], rr3].add(cs)

    if col_scale is not None:
        M = col_scale[:, None] * M * col_scale[None, :]
    return M + jnp.diag(hdiag + sigma)


def dense_a_matrix(cfg: PlannerConfig, qp: QPData) -> jnp.ndarray:
    """Materialize dense A (m, n) — for oracle/tests only."""
    n = cfg.num_vars
    eye = jnp.eye(n)
    cols = jax.vmap(lambda e: con_to_flat(a_matvec(cfg, qp, e)))(eye)
    return cols.T


def con_to_flat(w: ConVec) -> jnp.ndarray:
    return jnp.concatenate([w.eq.reshape(-1), w.sb.reshape(-1),
                            w.cb.reshape(-1), w.obs.reshape(-1)])


def flat_to_con(v: jnp.ndarray, cfg: PlannerConfig, K: int) -> ConVec:
    H, W = cfg.horizon, cfg.mpc_window
    s0, s1, s2 = NX * H, 2 * NX * H, 2 * NX * H + NU * W
    return ConVec(eq=v[:s0].reshape(H, NX), sb=v[s0:s1].reshape(H, NX),
                  cb=v[s1:s2].reshape(W, NU), obs=v[s2:].reshape(W, K))

"""Block-tridiagonal Cholesky for the MPC x-update normal matrix.

The ADMM x-update system M = P + sigma I + A^T rho A inherits the MPC's
horizon structure (the reference's sparse KKT assembly,
trajectory_planner/mpcPlanner.cpp:984-1072): ordering the decision
variables per step as v_i = [x_i (8), u_i (5)], M is block-tridiagonal
with 13x13 blocks — step i couples only (x_i, u_i, x_{i+1}) through the
dynamics equality rows and (x_i, u_i) through the obstacle rows.

The dense path factorizes the full (n,n) matrix (XLA's blocked Cholesky +
triangular solve are the measured setup hotspot on TPU, ~10+3 ms of a
~16 ms solve at production scale — RESULTS.md profile). This module
exploits the structure:

  1. build the (H, 13, 13) diagonal and (H-1, 13, 13) sub-diagonal blocks
     directly from the closed-form per-step contributions (no dense
     scatter assembly),
  2. run the block-Cholesky recursion S_{i+1} = D_{i+1} - G_i G_i^T,
     G_i = E_i L_i^{-T}, as a lax.scan with fully-unrolled 13x13
     Cholesky/forward-substitution (static shapes, vectorized over any
     vmapped batch),
  3. recover L^{-1} row-blocks by a second scan (Y_i = J_i (I_i - G_{i-1}
     Y_{i-1})), and
  4. form the explicit inverse Minv = Y^T Y with one MXU-friendly matmul
     (iterations need Minv as a matvec operand; triangular solves per
     iteration would serialize on TPU).

Cost: O(H * 13^3) for the factorization + O(H * 13 * n) for L^{-1} +
O(n^2 * 13H) for the final matmul — vs O(n^3) dense with XLA's slow
sequential panel loops. Same output as the dense path up to f32 roundoff.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from intent_mpc_tpu.ops.qp import ConVec, QPData, NX, NU, dynamics_matrices
from intent_mpc_tpu.utils.config import PlannerConfig

_PREC = jax.lax.Precision.HIGHEST
BS = NX + NU  # 13: per-step block size [x_i, u_i]


def chol_inv_small(S: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(…, m, m) SPD -> (L, J=L^{-1}), fully unrolled (m static, small).

    Cholesky via m rank-1 downdates (column j of L is A_j[:, j] /
    sqrt(A_j[j, j]); the downdate zeroes the handled row/column), then
    forward substitution on the identity for J. Everything is vector ops
    over the leading batch dims — no XLA While loops.
    """
    m = S.shape[-1]
    cols = []
    A = S
    for j in range(m):
        d = jax.lax.rsqrt(A[..., j, j])
        c = A[..., :, j] * d[..., None]                   # (…, m)
        A = A - c[..., :, None] * c[..., None, :]
        cols.append(c)
    L = jnp.stack(cols, axis=-1)                          # (…, m, m) lower

    eye = jnp.eye(m, dtype=S.dtype)
    J = jnp.zeros_like(L)
    for i in range(m):
        # rows >= i of J are still zero, L[i, k>i] = 0 -> sum hits k < i only
        s = jnp.einsum("...k,...kj->...j", L[..., i, :], J, precision=_PREC)
        row = (eye[i] - s) / L[..., i, i][..., None]
        J = J.at[..., i, :].set(row)
    return L, J


def build_blocks(cfg: PlannerConfig, qp: QPData, hdiag_s: jnp.ndarray,
                 sigma: float, rho: ConVec,
                 col_scale: jnp.ndarray | None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-step blocks of the scaled normal matrix.

    Returns (Dblk (H, 13, 13), Eblk (H, 13, 13)) with Eblk[i] =
    M[v_{i+1}, v_i] (last entry zero). Mirrors
    qp.assemble_normal_matrix's contributions exactly, block-local:
    dynamics-equality outer products, bound-row diagonals, obstacle
    gradient outer products, Ruiz column scaling, then the (already
    scaled) cost diagonal + sigma.
    """
    ts = cfg.ts
    H, W = cfg.horizon, cfg.mpc_window
    A, B = dynamics_matrices(ts)
    dt = hdiag_s.dtype
    A = A.astype(dt)
    B = B.astype(dt)

    r = rho.eq[1:]                                        # (W, 8)
    AtrA = jnp.einsum("ja,wj,jb->wab", A, r, A, precision=_PREC)
    AtrB = jnp.einsum("ja,wj,jb->wab", A, r, B, precision=_PREC)
    BtrB = jnp.einsum("ja,wj,jb->wab", B, r, B, precision=_PREC)

    ro = rho.obs * qp.obs_active                          # (W, K)
    G = qp.G.astype(dt)
    PP = jnp.einsum("wk,wka,wkb->wab", ro, G, G, precision=_PREC)  # (W,3,3)
    rs = ro * qp.obs_slack
    sd = jnp.sum(rs * qp.obs_dyn, axis=-1)                # (W,)
    ss = jnp.sum(rs * (1.0 - qp.obs_dyn), axis=-1)
    cd = -jnp.einsum("wk,wka->wa", rs * qp.obs_dyn, G, precision=_PREC)
    cs = -jnp.einsum("wk,wka->wa", rs * (1.0 - qp.obs_dyn), G,
                     precision=_PREC)

    # ---- diagonal blocks ----
    Dblk = jnp.zeros((H, BS, BS), dt)
    # xx: A^T r A (steps 0..W-1) + obstacle pos-pos 3x3
    Dblk = Dblk.at[:W, :NX, :NX].add(AtrA)
    Dblk = Dblk.at[:W, 0:3, 0:3].add(PP)
    # xu / uu couplings (steps 0..W-1)
    Dblk = Dblk.at[:W, :NX, NX:].add(AtrB)
    Dblk = Dblk.at[:W, NX:, :NX].add(jnp.swapaxes(AtrB, 1, 2))
    Dblk = Dblk.at[:W, NX:, NX:].add(BtrB)
    # obstacle slack diagonal / cross at u[3], u[4]
    ax3 = jnp.arange(3)
    Dblk = Dblk.at[:W, NX + 3, NX + 3].add(sd)
    Dblk = Dblk.at[:W, NX + 4, NX + 4].add(ss)
    Dblk = Dblk.at[:W, ax3, NX + 3].add(cd)
    Dblk = Dblk.at[:W, NX + 3, ax3].add(cd)
    Dblk = Dblk.at[:W, ax3, NX + 4].add(cs)
    Dblk = Dblk.at[:W, NX + 4, ax3].add(cs)

    ax8 = jnp.arange(NX)
    ax5 = jnp.arange(NU)
    # bound-row diagonals
    Dblk = Dblk.at[:, ax8, ax8].add(rho.sb)               # (H,8)
    Dblk = Dblk.at[:W, NX + ax5, NX + ax5].add(rho.cb)    # (W,5)
    # equality-row diagonals: rho.eq[0] on x_0; step i-1's "+r I" on x_i
    Dblk = Dblk.at[0, ax8, ax8].add(rho.eq[0])
    Dblk = Dblk.at[1:, ax8, ax8].add(r)

    # ---- sub-diagonal blocks: M[v_{i+1}, v_i] = [-r A | -r B] on x rows ----
    Eblk = jnp.zeros((H, BS, BS), dt)
    Eblk = Eblk.at[:W, :NX, :NX].set(-r[:, :, None] * A[None])
    Eblk = Eblk.at[:W, :NX, NX:].set(-r[:, :, None] * B[None])

    # ---- Ruiz column scaling (rows and columns of the A^T rho A part) ----
    if col_scale is not None:
        Dx = col_scale[: NX * H].reshape(H, NX)
        Du = col_scale[NX * H:].reshape(W, NU)
        dvec = jnp.concatenate(
            [Dx, jnp.concatenate([Du, jnp.ones((1, NU), dt)], axis=0)],
            axis=-1)                                       # (H, 13)
        Dblk = dvec[:, :, None] * Dblk * dvec[:, None, :]
        Eblk = Eblk.at[:W].multiply(
            dvec[1:, :, None] * dvec[:W, None, :])

    # ---- cost diagonal + sigma (already-scaled hdiag) + identity pads ----
    hx = hdiag_s[: NX * H].reshape(H, NX)
    hu = hdiag_s[NX * H:].reshape(W, NU)
    Dblk = Dblk.at[:, ax8, ax8].add(hx + sigma)
    Dblk = Dblk.at[:W, NX + ax5, NX + ax5].add(hu + sigma)
    # last block's u slots are padding: unit diagonal, no coupling
    Dblk = Dblk.at[W, NX + ax5, NX + ax5].set(1.0)
    return Dblk, Eblk


def flat_to_block_perm(cfg: PlannerConfig) -> jnp.ndarray:
    """Index map: flat layout [X (H*8), U (W*5)] -> padded block layout
    [v_0 … v_{H-1}] with v_i 13-wide (last block x-only + pad)."""
    import numpy as np
    H, W = cfg.horizon, cfg.mpc_window
    idx = np.zeros(NX * H + NU * W, np.int32)
    for i in range(H):
        idx[NX * i: NX * (i + 1)] = BS * i + np.arange(NX)
    for i in range(W):
        idx[NX * H + NU * i: NX * H + NU * (i + 1)] = BS * i + NX + np.arange(NU)
    return jnp.asarray(idx)


def block_apply(Dblk: jnp.ndarray, Eblk: jnp.ndarray, perm: jnp.ndarray,
                x: jnp.ndarray, n: int) -> jnp.ndarray:
    """M @ x through the block-tridiagonal blocks (flat layout in/out).

    The refinement hotspot: applying the candidate's own normal matrix
    costs a full constraint-space round trip (a_matvec + at_matvec, ~10
    small einsum/scatter chains) in closed form, or an (n,n) HBM read
    densely. The (H, 13, 13) blocks are ~20 KB per candidate — 30x less
    traffic than dense — and three batched einsums replace the chains:
        y_i = D_i x_i + E_{i-1} x_{i-1} + E_i^T x_{i+1}.
    """
    H = Dblk.shape[0]
    xb = jnp.zeros(H * BS, Dblk.dtype).at[perm].set(x).reshape(H, BS)
    # broadcast-multiply-reduce instead of einsum/dot_general: 13-wide
    # contractions pad to 128x128 MXU tiles (measured slower than the
    # closed-form round trip); elementwise VPU work reads only the real
    # 13x13 blocks
    y = jnp.sum(Dblk * xb[:, None, :], axis=-1)
    lo = jnp.sum(Eblk[:-1] * xb[:-1, None, :], axis=-1)
    up = jnp.sum(Eblk[:-1] * xb[1:, :, None], axis=-2)
    y = y.at[1:].add(lo).at[:-1].add(up)
    return y.reshape(-1)[perm]


def structured_minv(cfg: PlannerConfig, qp: QPData, hdiag_s: jnp.ndarray,
                    sigma: float, rho: ConVec,
                    col_scale: jnp.ndarray | None) -> jnp.ndarray:
    """Explicit M^{-1} (n, n) in the flat layout, via the block-tridiagonal
    Cholesky. Drop-in replacement for
    cholesky(assemble_normal_matrix(...)) + triangular solves."""
    H, W = cfg.horizon, cfg.mpc_window
    n = cfg.num_vars
    N = BS * H
    Dblk, Eblk = build_blocks(cfg, qp, hdiag_s, sigma, rho, col_scale)

    # ---- block-Cholesky recursion (scan over the horizon) ----
    # step i: S_i known; J_i = L_i^{-1}; G_i = E_i J_i^T;
    #         S_{i+1} = D_{i+1} - G_i G_i^T
    D_next = jnp.concatenate([Dblk[1:], jnp.zeros_like(Dblk[:1])], axis=0)

    def fac_step(S, inp):
        E_i, D_nx = inp
        _, J_i = chol_inv_small(S)
        G_i = jnp.einsum("ab,cb->ac", E_i, J_i, precision=_PREC)
        S_nx = D_nx - jnp.einsum("ab,cb->ac", G_i, G_i, precision=_PREC)
        return S_nx, (J_i, G_i)

    _, (J, G) = jax.lax.scan(fac_step, Dblk[0], (Eblk, D_next))

    # ---- L^{-1} row-blocks: Y_i = J_i (I_i - G_{i-1} Y_{i-1}) ----
    G_prev = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)

    def linv_step(Y_prev, inp):
        J_i, G_im1, i = inp
        T = -jnp.einsum("ab,bn->an", G_im1, Y_prev, precision=_PREC)
        Y_i = jnp.einsum("ab,bn->an", J_i, T, precision=_PREC)
        # I_i contribution: columns [13 i, 13 i + 13) receive J_i (the
        # matmul term is zero there — Y_{i-1} has no columns >= 13 i)
        Y_i = jax.lax.dynamic_update_slice(Y_i, J_i, (0, i * BS))
        return Y_i, Y_i

    _, Ys = jax.lax.scan(linv_step, jnp.zeros((BS, N), Dblk.dtype),
                         (J, G_prev, jnp.arange(H)))
    Linv = Ys.reshape(N, N)

    Minv_blk = jnp.einsum("kn,km->nm", Linv, Linv, precision=_PREC)
    perm = flat_to_block_perm(cfg)
    return Minv_blk[perm][:, perm]

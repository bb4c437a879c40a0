"""Pallas TPU kernel: fused ADMM iteration loop, one candidate per grid cell.

The XLA path (ops/admm.py) re-reads the explicit inverse M^{-1} and the
constraint data from HBM on every ADMM iteration. This kernel pins the
whole per-candidate problem in VMEM once and runs the full fixed-iteration
loop on-chip: per iteration two (m,n) MXU products with the scaled
constraint matrix (A and A^T via reversed contraction -- A is stored
once), one (n,n) x-update matvec (+1 refinement), and the projection/dual
updates on the VPU. No HBM traffic inside the loop.

Layout: everything is a flat, lane-padded column vector -- n padded to a
multiple of 128, constraint rows (in qp.con_to_flat order) padded with
loose rows to a multiple of 128. Mosaic handles (m_pad, n_pad) @ (n_pad, 1)
matmuls natively; the structured per-step shapes of the XLA path would
need unsupported (H, 8) <-> flat relayouts in-kernel, so the scaled dense
A is materialized OUTSIDE (a cheap scatter from the closed-form structure)
and shipped per candidate.

VMEM per candidate ~ A (m_pad x n_pad) + M + M^{-1}: fits for obstacle
slot counts up to ~64 at horizon 30 (with a raised vmem limit); larger
problems fall back to the XLA path.

STATUS: hardware-validated, NOT the production default. The kernel is
checked against the XLA path in interpret mode (tests/test_pallas_admm.py)
and on v5e hardware. The one hardware landmine (found by bisecting
primitives on-chip): Mosaic lowers dots to bf16 MXU passes by default —
`preferred_element_type=f32` only sets the accumulator — and the
rho_eq=1e3 constraint rows amplify the ~1e-2 bf16 noise into divergence.
Every dot in the kernel therefore carries precision=HIGHEST (3-pass f32
emulation). Interpret mode runs true f32 on CPU, which is why it always
agreed.

Measured v5e perf at production scale (96 candidates, horizon 30, 100
iters): 530 solves/s vs 2226 solves/s for the XLA path. The per-candidate
grid makes every product a 1-column matvec (1/128 MXU lane utilization);
the XLA path instead batches all candidates into (C, n) matmuls that fill
the MXU, which beats VMEM residency by 4x. The XLA path (ops/admm.py)
stays the production solver by measurement, not by default.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable off-TPU but kernels only compile on TPU
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


class DenseScaledProblem(NamedTuple):
    """Per-candidate scaled ADMM problem (leading axis = candidates)."""

    minv: jnp.ndarray   # (C, n_pad, n_pad)
    mmat: jnp.ndarray   # (C, n_pad, n_pad)
    amat: jnp.ndarray   # (C, m_pad, n_pad) scaled constraint matrix
    q: jnp.ndarray      # (C, n_pad, 1)
    x0: jnp.ndarray     # (C, n_pad, 1)
    rho: jnp.ndarray    # (C, m_pad, 1)
    lo: jnp.ndarray     # (C, m_pad, 1)
    hi: jnp.ndarray     # (C, m_pad, 1)


def _kernel(iters: int, sigma: float, alpha: float, refine: int,
            minv, mmat, amat, q, x0, rho, lo, hi, x_out):
    f32 = jnp.float32
    # CRITICAL: precision=HIGHEST. On TPU the MXU natively multiplies in
    # bf16; without the 3-pass f32 emulation every matvec carries ~1e-2
    # relative noise which the rho_eq=1e3 constraint rows amplify into
    # divergence (this, not a lowering bug, was the "garbage on hardware" —
    # interpret mode runs on CPU in true f32 and hid it).
    PREC = jax.lax.Precision.HIGHEST
    Minv = minv[0]
    M = mmat[0]
    A = amat[0]
    qv = q[0]
    R = rho[0]
    L = lo[0]
    U = hi[0]

    def a_mv(x):          # (n,1) -> (m,1)
        return jnp.dot(A, x, precision=PREC, preferred_element_type=f32)

    def at_mv(w):         # (m,1) -> (n,1): A^T w without storing A^T
        return jax.lax.dot_general(
            A, w, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=PREC, preferred_element_type=f32)

    x = x0[0]
    z = a_mv(x)
    y = jnp.zeros_like(z)

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - qv + at_mv(R * z - y)
        xt = jnp.dot(Minv, rhs, precision=PREC, preferred_element_type=f32)
        for _ in range(refine):
            r = rhs - jnp.dot(M, xt, precision=PREC,
                              preferred_element_type=f32)
            xt = xt + jnp.dot(Minv, r, precision=PREC,
                              preferred_element_type=f32)
        zt = a_mv(xt)
        x_n = alpha * xt + (1.0 - alpha) * x
        zr = alpha * zt + (1.0 - alpha) * z
        z_n = jnp.clip(zr + y / R, L, U)
        y_n = y + R * (zr - z_n)
        return (x_n, z_n, y_n)

    x, z, y = jax.lax.fori_loop(0, iters, body, (x, z, y))
    x_out[0] = x


def admm_iterations_dense(sp: DenseScaledProblem, iters: int, sigma: float,
                          alpha: float, refine: int = 1,
                          interpret: bool = False) -> jnp.ndarray:
    """Run the fused loop for all candidates; returns scaled x (C, n_pad)."""
    C, n_pad, _ = sp.minv.shape
    m_pad = sp.amat.shape[1]

    def spec(shape):
        kwargs = {}
        if _HAS_PLTPU and not interpret:
            kwargs["memory_space"] = pltpu.VMEM
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape),
                            **kwargs)

    kern = functools.partial(_kernel, iters, sigma, alpha, refine)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        # the double-buffered blocks exceed the 16 MB default scoped-vmem
        # budget; raise it toward the physical VMEM size
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kern,
        grid=(C,),
        in_specs=[
            spec((n_pad, n_pad)), spec((n_pad, n_pad)), spec((m_pad, n_pad)),
            spec((n_pad, 1)), spec((n_pad, 1)), spec((m_pad, 1)),
            spec((m_pad, 1)), spec((m_pad, 1)),
        ],
        out_specs=spec((n_pad, 1)),
        out_shape=jax.ShapeDtypeStruct((C, n_pad, 1), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(*sp)
    return out[..., 0]

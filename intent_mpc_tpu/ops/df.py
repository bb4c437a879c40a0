"""Double-float (compensated f32) arithmetic for TPU.

TPU v5e has no f64 hardware; the f32 iterative-refinement floor on the
MPC x-update system is eps32 * cond(M) — measured ~2.5e-3 in positions at
benchmark scale (RESULTS.md), above the 1e-3 control-parity north star.
This module provides error-free transformations (Knuth two-sum, Dekker
split/two-prod — exact under IEEE round-to-nearest f32, which the TPU VPU
implements) and a compensated matvec, so residuals can be computed to
~eps32^2 ~ 1e-14 effective precision entirely on-device. Used by the
polish stage (ops/polish.py) to push the chosen candidate's solution to
f64-oracle parity without any f64 ops.

Compiler landmines (all measured on this machine's XLA:CPU backend, and
defended against here):

  * Dekker's arithmetic split (c = 4097a; hi = c - (c - a)) breaks when
    the vectorized loop emitter contracts its mul/sub pairs into FMAs
    (onset at arrays >= 32 elements). Fix: bit-mask split (`split`).
  * A raw multiply feeding an add contracts to fma(a, b, c), so
    two_sum(p, q) with p = a*b sees s != fl(p + q) and its error term is
    garbage. `jax.lax.optimization_barrier` around the product does NOT
    stop this (the contraction happens in LLVM, below HLO). Fix: `_pin` —
    add an opaque zero to every product before it can meet an add. Any
    contraction of a*b + 0 is fma(a, b, 0) = fl(a*b), exact, and the
    downstream add then has an add-result operand, which is not
    contractible.

Invariant for callers: never feed a *raw* jnp multiply into two_sum /
_comp_reduce — route products through two_prod (already pinned) or _pin.
tests/test_df.py asserts the identities hold under jit on the running
backend.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_HI_MASK = jnp.uint32(0xFFFFF000)  # clear the low 12 stored-mantissa bits


def _pin(v: jnp.ndarray) -> jnp.ndarray:
    """Make a float value safe to add: v + opaque 0.

    If LLVM contracts the producer multiply into this add it computes
    fma(a, b, 0) = fl(a*b) — exact — and the result is an add, which no
    later add can contract with. See module docstring."""
    z = jax.lax.optimization_barrier(jnp.zeros((), v.dtype))
    return v + z


def two_sum(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """s + e == a + b exactly (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a: jnp.ndarray, b: jnp.ndarray):
    """Requires |a| >= |b| (Dekker)."""
    s = a + b
    return s, b - (s - a)


def split(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact 12/12-bit mantissa split via bit masking.

    Dekker's arithmetic split (c = 4097a; hi = c - (c - a)) breaks when a
    vectorizing backend contracts the mul/sub pairs into FMAs (measured:
    XLA CPU does exactly that for arrays of >= 32 elements). Masking the
    stored mantissa is immune to every float rewrite: hi keeps 12
    significant bits, lo = a - hi is exact (same binade), and all four
    half-products fit f32's 24-bit mantissa exactly."""
    ai = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(ai & _HI_MASK, jnp.float32)
    return hi, a - hi


def two_prod(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """p + e == a * b exactly (Dekker). p is pinned (safe to add)."""
    p = _pin(a * b)
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(ah, al, bh, bl):
    """(ah+al) + (bh+bl) -> normalized (hi, lo)."""
    s, e = two_sum(ah, bh)
    e = e + (al + bl)
    return fast_two_sum(s, e)


def df_neg(ah, al):
    return -ah, -al


def df_scale(ah, al, s):
    """(ah+al) * s for exact-ish scalar s (compensated)."""
    p, e = two_prod(ah, s)
    e = e + al * s
    return fast_two_sum(p, e)


def _comp_reduce(p: jnp.ndarray, e: jnp.ndarray, axis: int):
    """Pairwise-compensated reduction: sums `p` along `axis` with two_sum
    at every combine, accumulating all rounding into `e` (plain-summed —
    its magnitude is already ~eps * |terms|). Returns (hi, lo)."""
    n = p.shape[axis]
    while n > 1:
        half = n // 2
        lo_p = jax.lax.slice_in_dim(p, 0, half, axis=axis)
        hi_p = jax.lax.slice_in_dim(p, half, 2 * half, axis=axis)
        lo_e = jax.lax.slice_in_dim(e, 0, half, axis=axis)
        hi_e = jax.lax.slice_in_dim(e, half, 2 * half, axis=axis)
        s, err = two_sum(lo_p, hi_p)
        ee = lo_e + hi_e + err
        if 2 * half < n:   # odd leftover element rides along
            rest_p = jax.lax.slice_in_dim(p, 2 * half, n, axis=axis)
            rest_e = jax.lax.slice_in_dim(e, 2 * half, n, axis=axis)
            s0 = jax.lax.slice_in_dim(s, 0, 1, axis=axis)
            e0 = jax.lax.slice_in_dim(ee, 0, 1, axis=axis)
            s0n, err0 = two_sum(s0, rest_p)
            e0n = e0 + rest_e + err0
            s = jnp.concatenate(
                [s0n, jax.lax.slice_in_dim(s, 1, half, axis=axis)], axis=axis)
            ee = jnp.concatenate(
                [e0n, jax.lax.slice_in_dim(ee, 1, half, axis=axis)],
                axis=axis)
        p, e = s, ee
        n = half
    hi = jnp.squeeze(p, axis=axis)
    lo = jnp.squeeze(e, axis=axis)
    return fast_two_sum(hi, lo)


def df_matvec(M: jnp.ndarray, xh: jnp.ndarray, xl: jnp.ndarray):
    """M @ (xh + xl) with ~eps^2 accuracy. M (…, m, n) f32, x (…, n).

    Products are exact (Dekker two-prod); the reduction over n is
    pairwise-compensated, so massive cancellation (the residual case) is
    captured instead of rounded away. Elementwise VPU work, no MXU —
    intended for the low-rate polish path, not the ADMM hot loop."""
    p, e = two_prod(M, xh[..., None, :])
    e = e + M * xl[..., None, :]
    return _comp_reduce(p, e, axis=-1)


def df_dot_accurate(a: jnp.ndarray, b: jnp.ndarray):
    """Compensated dot product of two f32 vectors -> (hi, lo)."""
    p, e = two_prod(a, b)
    return _comp_reduce(p, e, axis=-1)

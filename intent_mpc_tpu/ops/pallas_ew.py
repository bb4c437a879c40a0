"""Fused elementwise ADMM-chain kernel (VERDICT r3 item 4).

The production iteration's z/y relax/project/dual chain is ~a dozen
small VPU fusions per iteration across the four ConVec groups; the
roofline (RESULTS.md) shows the cycle sitting 2-3x above its all-HBM
floor on exactly this per-op dispatch latency. This kernel fuses the
whole chain — x blend, z relax, projection, dual update, and the NEXT
iteration's rho*z - y — into ONE Pallas dispatch per ADMM iteration:

    x_n   = alpha * x_t + (1-alpha) * x
    zr    = alpha * z_t + (1-alpha) * z          (per group)
    z_n   = clip(zr + y/rho, l, u)
    y_n   = y + rho * (zr - z_n)
    rzy   = rho * z_n - y_n                      (feeds at_s next iter)

No matmuls: the Minv / A / A^T applies stay in XLA, so the bf16-dot
precision landmine that killed the fully-fused fleet kernel
(ops/pallas_fused.py post-mortem) is never touched.

Batching: the engine calls the solver under vmap(scenarios) x
vmap(candidates). Pallas' automatic vmap rule would grid one program
per (scenario, candidate) with 1-row blocks — sublane-starved DMAs — so
ew_chain is a custom_vmap whose batching rule recursively re-enters
itself; the OUTERMOST application executes once with every batch axis
present, flattens them into one row axis, and launches a single kernel
with (rows x group-width) blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU backend params (absent on CPU-only installs)
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# (x, x_t) + 4 groups x (z, y, zt, rho, l, u)
NUM_GROUPS = 4
NUM_IN = 2 + 6 * NUM_GROUPS
ROW_BLOCK = 64   # rows per grid step: the obs block pads 64->128 lanes,
                 # so 64 rows x 4 groups x 9 live arrays ~ 34 MB VMEM


def _ew_kernel(alpha: float, *refs):
    ins = refs[:NUM_IN]
    outs = refs[NUM_IN:]
    x, x_t = ins[0], ins[1]
    x_n = outs[0]
    x_n[:] = alpha * x_t[:] + (1.0 - alpha) * x[:]
    for g in range(NUM_GROUPS):
        z, y, zt, rho, l, u = (ins[2 + k * NUM_GROUPS + g] for k in range(6))
        z_n = outs[1 + g]
        y_n = outs[1 + NUM_GROUPS + g]
        rzy = outs[1 + 2 * NUM_GROUPS + g]
        zv, yv, rv = z[:], y[:], rho[:]
        zr = alpha * zt[:] + (1.0 - alpha) * zv
        zn = jnp.clip(zr + yv / rv, l[:], u[:])
        yn = yv + rv * (zr - zn)
        z_n[:] = zn
        y_n[:] = yn
        rzy[:] = rv * zn - yn


def _ew_pallas(alpha: float, interpret: bool, x, x_t, groups):
    """groups: tuple of 24 arrays in NATIVE trailing shapes — (N, H, 8),
    (N, H, 8), (N, W, 5), (N, W, K) — g cycling fastest (z.eq z.sb z.cb
    z.obs, y..., zt..., rho..., l..., u...).

    Native shapes matter: the HBM buffers are already (8,128)-tiled on
    their trailing dims, so blocks in those shapes DMA the same padded
    tiles every other op in the program touches — flattening groups to
    (N, w) instead forces XLA to insert a physical re-tiling copy per
    array per iteration (measured: ~36 extra copies per program, a 2.2x
    cycle regression; the lane padding the native blocks carry is VPU
    waste only, which is free at this arithmetic intensity)."""
    N = x.shape[0]
    R = min(ROW_BLOCK, N)
    grid = (-(-N // R),)

    def spec(a):
        shape = (R,) + a.shape[1:]
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (i,) + (0,) * (_nd - 1))

    ins = (x, x_t) + tuple(groups)
    in_specs = [spec(a) for a in ins]
    out_arrays = (x,) + tuple(groups[:NUM_GROUPS]) \
        + tuple(groups[NUM_GROUPS:2 * NUM_GROUPS]) \
        + tuple(groups[:NUM_GROUPS])
    out_shape = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                      for a in out_arrays)
    out_specs = tuple(spec(a) for a in out_arrays)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    outs = pl.pallas_call(
        functools.partial(_ew_kernel, alpha),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(*ins)
    return outs


def ew_reference(alpha: float, x, x_t, z, y, zt, rho, l, u):
    """Plain-jnp reference of the fused chain over ConVec groups (the
    exact math make_step's grouped path runs) — the CPU path and the
    kernel-parity oracle (test_pallas_ew)."""
    x_n = alpha * x_t + (1.0 - alpha) * x
    zr = zt.map(lambda zt_g, z_g: alpha * zt_g + (1.0 - alpha) * z_g, z)
    z_n = zr.map(lambda zr_g, y_g, r_g, l_g, u_g:
                 jnp.clip(zr_g + y_g / r_g, l_g, u_g), y, rho, l, u)
    y_n = y.map(lambda y_g, zr_g, zn_g, r_g: y_g + r_g * (zr_g - zn_g),
                zr, z_n, rho)
    rzy = z_n.map(lambda zn_g, r_g, yn_g: r_g * zn_g - yn_g, rho, y_n)
    return x_n, z_n, y_n, rzy


@functools.lru_cache(maxsize=8)
def _make_ew_chain(alpha: float, use_pallas: bool, interpret: bool):
    """Build the custom_vmap'd fused chain over flat args.

    Args (flat): x, x_t, then 24 group arrays (z*4, y*4, zt*4, rho*4,
    l*4, u*4) in native group shapes ((H,8),(H,8),(W,5),(W,K)) with any
    number of leading batch axes. Returns 13 arrays (x_n, z*4, y*4,
    rzy*4)."""

    @jax.custom_batching.custom_vmap
    def chain(*args):
        x, x_t = args[0], args[1]
        groups = args[2:]
        if not use_pallas:
            # pure-jnp path (CPU / tests): identical math, no kernel
            return (alpha * x_t + (1.0 - alpha) * x,) + _jnp_groups(groups)
        lead = x.shape[:-1]
        N = 1
        for d in lead:
            N *= d
        # collapse ONLY the leading batch axes (a pure index bitcast —
        # trailing group dims keep their tiled layout, see _ew_pallas)
        x2 = x.reshape(N, x.shape[-1])
        xt2 = x_t.reshape(N, x.shape[-1])
        g2 = tuple(a.reshape((N,) + a.shape[len(lead):]) for a in groups)
        outs = _ew_pallas(alpha, interpret, x2, xt2, g2)
        x_n = outs[0].reshape(x.shape)
        rest = tuple(o.reshape(g.shape)
                     for o, g in zip(outs[1:], groups[:3 * NUM_GROUPS]))
        return (x_n,) + rest

    def _jnp_groups(groups):
        outs_z, outs_y, outs_r = [], [], []
        for g in range(NUM_GROUPS):
            z, y, zt, rho, l, u = (groups[k * NUM_GROUPS + g]
                                   for k in range(6))
            zr = alpha * zt + (1.0 - alpha) * z
            zn = jnp.clip(zr + y / rho, l, u)
            yn = y + rho * (zr - zn)
            outs_z.append(zn)
            outs_y.append(yn)
            outs_r.append(rho * zn - yn)
        return tuple(outs_z) + tuple(outs_y) + tuple(outs_r)

    @chain.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = tuple(
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched))
        # recursive re-entry: further (outer) vmap levels keep collapsing
        # into this same custom_vmap until the outermost call executes
        # the primal once with every batch axis materialized
        outs = chain(*args)
        return outs, tuple(True for _ in outs)

    return chain


def ew_chain(alpha: float, x, x_t, z, y, zt, rho, l, u,
             use_pallas=None, interpret=None):
    """Fused elementwise ADMM chain over ConVec groups.

    Returns (x_n, z_n: ConVec, y_n: ConVec, rzy: ConVec). Drop-in for
    the four grouped-map lines of admm_solve's step (identical math,
    pinned by test_pallas_ew)."""
    from intent_mpc_tpu.ops.qp import ConVec
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not use_pallas
    fn = _make_ew_chain(float(alpha), bool(use_pallas), bool(interpret))
    args = (x, x_t) + tuple(z) + tuple(y) + tuple(zt) + tuple(rho) \
        + tuple(l) + tuple(u)
    outs = fn(*args)
    x_n = outs[0]
    z_n = ConVec(*outs[1:1 + NUM_GROUPS])
    y_n = ConVec(*outs[1 + NUM_GROUPS:1 + 2 * NUM_GROUPS])
    rzy = ConVec(*outs[1 + 2 * NUM_GROUPS:1 + 3 * NUM_GROUPS])
    return x_n, z_n, y_n, rzy

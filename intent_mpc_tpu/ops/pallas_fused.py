"""Fleet-fused ADMM solver kernel: the whole batch, VMEM-resident.

Replaces the per-iteration XLA dispatch chain for the production solve
(the OsqpEigen replacement at fleet scale). The measured XLA bottleneck
(RESULTS.md round-2 profile) is per-iteration HBM traffic: the 385x385
explicit inverse is re-read every iteration (61 us/iter for 192
problems) and each closed-form refinement re-rounds through constraint
space (~110 us per refine step). This kernel holds EVERYTHING in VMEM
for the full iteration budget — per-scenario inverses (32 MB), problem
data, iterates — so per-iteration cost is pure compute.

Design (all problems on lanes):

 * Problems are packed P = 8*s + c (s scenario < S, c candidate < 6,
   lanes 6,7 of each group dead): arrays are (rows, 8*S) with 8*S a
   lane-tile multiple. Elementwise z/y updates use full lanes.
 * The UNSCALED constraint matrix of the dynamics/bound rows is shared
   by every problem, so a_s/at_s become ONE wide matmul each with a
   static (n_ext, n) operand; Ruiz scaling is applied as per-problem
   elementwise D/E multiplies (a_s(x) = E * (A @ (D * x))). The
   extended operator also emits per-step COPY rows (p-hat and slack
   components), so the obstacle rows — the only per-problem rows —
   reduce to 3D broadcast elementwise math on (W, K, lanes) arrays, and
   their transpose contributions flow back through the same matmul.
 * The x-update explicit-inverse dot cannot share lanes across
   scenarios (different Minv); instead each scenario's dot runs against
   its FULL 128-lane tile (the MXU pads the 6 live columns to 128
   anyway, so the wide dot costs the same) and a static one-hot lane
   mask accumulates the 8 valid lanes per scenario.
 * Shared-factor exactness: the factor is the scenario's candidate-mean
   QP; per-candidate correctness comes from `refine` closed-form
   iterative-refinement steps per x-update, exactly like the XLA path —
   but in-kernel each refine costs two VMEM matmuls, not an HBM round
   trip.

All dots run at precision HIGHEST (the Mosaic default is bf16 MXU
passes — the round-1 hardware landmine; memory: intent-mpc-benchmark-
findings). Copy/one-hot operands are exact at any precision (single
nonzero per row), data matmuls match the XLA path's HIGHEST semantics.

Reference being replaced: OsqpEigen/libosqp ADMM iterations
(trajectory_planner/.../OsqpEigen/Solver.hpp, mpcPlanner.cpp:436-527).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from intent_mpc_tpu.ops import qp as qplib
from intent_mpc_tpu.ops.qp import ConVec, QPData, NX, NU
from intent_mpc_tpu.utils.config import PlannerConfig, SolverConfig

try:  # pragma: no cover
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pl = None
    pltpu = None
    _HAS_PLTPU = False

_PREC = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Static extended operator: A_ext (n_ext, n_pad)
# rows: [eq (8H) | sb (8H) | cb (5W) | pad | px (Wp) | py | pz | u3 | u4]
# ---------------------------------------------------------------------------

class FleetDims(NamedTuple):
    H: int
    W: int
    K: int          # padded obstacle slots (multiple of 8; inert pads)
    n: int          # real variable count
    n_pad: int      # 512-ish
    m_lin: int      # 8H + 8H + 5W real linear rows
    lin_pad: int    # padded linear block
    Wp: int         # W padded to sublane multiple (32)
    n_ext: int      # lin_pad + 5 * Wp
    P: int          # lanes = 8 * S


def fleet_dims(cfg: PlannerConfig, K: int, S: int) -> FleetDims:
    H, W = cfg.horizon, cfg.mpc_window
    K = ((K + 7) // 8) * 8      # sublane-align the (W, K, P) obs arrays
    n = cfg.num_vars
    n_pad = max(512, ((n + 127) // 128) * 128)
    m_lin = 2 * NX * H + NU * W
    lin_pad = ((m_lin + 7) // 8) * 8
    Wp = ((W + 7) // 8) * 8
    n_ext = lin_pad + 5 * Wp
    return FleetDims(H=H, W=W, K=K, n=n, n_pad=n_pad, m_lin=m_lin,
                     lin_pad=lin_pad, Wp=Wp, n_ext=n_ext, P=8 * S)


@functools.lru_cache(maxsize=8)
def _a_ext(cfg: PlannerConfig, K: int, S: int) -> np.ndarray:
    """The shared unscaled extended constraint operator (n_ext, n_pad)."""
    d = fleet_dims(cfg, K, S)
    H, W = d.H, d.W
    ts = cfg.ts
    A = np.zeros((d.n_ext, d.n_pad), np.float32)

    def xcol(i, j):
        return NX * i + j

    def ucol(i, j):
        return NX * H + NU * i + j

    # eq rows: row 0 block = -x_0; row block i>=1: A x_{i-1} + B u_{i-1} - x_i
    for j in range(NX):
        A[j, xcol(0, j)] = -1.0
    for i in range(1, H):
        r = NX * i
        for j in range(NX):
            A[r + j, xcol(i, j)] = -1.0
        for j in range(3):
            A[r + j, xcol(i - 1, j)] += 1.0
            A[r + j, xcol(i - 1, j + 3)] += ts
            A[r + j, ucol(i - 1, j)] += 0.5 * ts * ts
            A[r + 3 + j, xcol(i - 1, j + 3)] += 1.0
            A[r + 3 + j, ucol(i - 1, j)] += ts
        A[r + 6, ucol(i - 1, 3)] += 1.0
        A[r + 7, ucol(i - 1, 4)] += 1.0
    # sb rows: identity on x
    for i in range(H):
        for j in range(NX):
            A[NX * H + NX * i + j, xcol(i, j)] = 1.0
    # cb rows: identity on u
    for i in range(W):
        for j in range(NU):
            A[2 * NX * H + NU * i + j, ucol(i, j)] = 1.0
    # copy rows: p-hat components and slack controls per step
    base = d.lin_pad
    for i in range(W):
        A[base + i, xcol(i, 0)] = 1.0                 # px
        A[base + d.Wp + i, xcol(i, 1)] = 1.0          # py
        A[base + 2 * d.Wp + i, xcol(i, 2)] = 1.0      # pz
        A[base + 3 * d.Wp + i, ucol(i, 3)] = 1.0      # u3
        A[base + 4 * d.Wp + i, ucol(i, 4)] = 1.0      # u4
    return A


# ---------------------------------------------------------------------------
# Fleet problem packing (XLA side)
# ---------------------------------------------------------------------------

class FleetProblem(NamedTuple):
    """All-problems-on-lanes packed solver inputs. S scenarios, P=8S lanes."""
    a_ext: jnp.ndarray     # (n_ext, n_pad) shared, unscaled
    minv: jnp.ndarray      # (S, n_pad, n_pad) scenario factor inverses
    d_scale: jnp.ndarray   # (n_pad, P) Ruiz column scale (shared per group)
    e_lin: jnp.ndarray     # (lin_pad, P) row scale of linear rows
    q: jnp.ndarray         # (n_pad, P) scaled linear cost
    hsig: jnp.ndarray      # (n_pad, P) scaled cost diag + sigma
    x0: jnp.ndarray        # (n_pad, P) scaled warm start
    rho_lin: jnp.ndarray   # (lin_pad, P)
    ir_lin: jnp.ndarray    # (lin_pad, P) 1/rho
    lo_lin: jnp.ndarray    # (lin_pad, P)
    hi_lin: jnp.ndarray    # (lin_pad, P)
    gx: jnp.ndarray        # (W, K, P) E_obs-scaled obstacle gradients
    gy: jnp.ndarray        # (W, K, P)
    gz: jnp.ndarray        # (W, K, P)
    s3: jnp.ndarray        # (W, K, P) -E_obs * dyn * slack   (signed)
    s4: jnp.ndarray        # (W, K, P) -E_obs * (1-dyn) * slack
    rho_obs: jnp.ndarray   # (W, K, P)
    ir_obs: jnp.ndarray    # (W, K, P)
    lo_obs: jnp.ndarray    # (W, K, P)


def pack_fleet(cfg: PlannerConfig, qps: QPData, minv: jnp.ndarray,
               D: jnp.ndarray, E: ConVec, c: jnp.ndarray,
               warm: jnp.ndarray,
               scfg: Optional[SolverConfig] = None) -> FleetProblem:
    """Pack (S, 6, ...) candidate QPs + per-scenario factors into the
    lane layout. D (S, n), E ConVec with (S, ...) leaves, c (S,),
    minv (S, n, n), warm (S, 6, n)."""
    scfg = scfg or cfg.solver
    S = minv.shape[0]
    K = qps.G.shape[-2]
    d = fleet_dims(cfg, K, S)
    H, W, n, P = d.H, d.W, d.n, d.P

    def lanes(a, fill=0.0):
        """(S, 6, rows...) -> (rows..., P) with candidate groups of 8."""
        pad = jnp.full(a.shape[:1] + (2,) + a.shape[2:], fill, a.dtype)
        a8 = jnp.concatenate([a, pad], axis=1)          # (S, 8, ...)
        moved = jnp.moveaxis(a8.reshape((S * 8,) + a.shape[2:]), 0, -1)
        return moved

    def lanes_shared(a, fill=0.0):
        """(S, rows...) -> (rows..., P) replicated over the 8-lane group."""
        a8 = jnp.broadcast_to(a[:, None], a.shape[:1] + (8,) + a.shape[1:])
        return jnp.moveaxis(a8.reshape((S * 8,) + a.shape[1:]), 0, -1)

    hdiag = qplib.hessian_diag(cfg)
    h_s = c[:, None] * D * D * hdiag[None, :]           # (S, n)
    q_s = c[:, None, None] * D[:, None, :] * qps.q      # (S, 6, n)

    def padrows(a, rows):
        return jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (rows - a.shape[-1],), a.dtype)],
            axis=-1)

    rho = jax.vmap(jax.vmap(
        lambda qp: qplib.rho_vec(cfg, qp, scfg.rho, scfg.rho_eq_scale)
    ))(qps)

    # ---- linear-row blocks: eq | sb | cb, scaled bounds & rho ----
    def lin_flat(v: ConVec):
        return jnp.concatenate(
            [v.eq.reshape(v.eq.shape[:-2] + (-1,)),
             v.sb.reshape(v.sb.shape[:-2] + (-1,)),
             v.cb.reshape(v.cb.shape[:-2] + (-1,))], axis=-1)

    l_s = jax.tree.map(lambda lv, ev: lv * ev[:, None], qps.l,
                       ConVec(E.eq, E.sb, E.cb, E.obs))
    u_s = jax.tree.map(lambda uv, ev: uv * ev[:, None], qps.u,
                       ConVec(E.eq, E.sb, E.cb, E.obs))
    big = jnp.float32(1e30)
    lo_lin = padrows(jnp.nan_to_num(lin_flat(l_s), neginf=-big), d.lin_pad)
    hi_lin = padrows(jnp.nan_to_num(lin_flat(u_s), posinf=big), d.lin_pad)
    hi_lin = hi_lin + (jnp.arange(d.lin_pad) >= d.m_lin) * big
    lo_lin = lo_lin - (jnp.arange(d.lin_pad) >= d.m_lin) * big
    rho_lin = padrows(lin_flat(rho), d.lin_pad) \
        + (jnp.arange(d.lin_pad) >= d.m_lin) * 1e-6
    e_lin = padrows(lin_flat(ConVec(E.eq, E.sb, E.cb, E.obs)), d.lin_pad)

    # ---- obstacle blocks (already include the row scale E_obs) ----
    Eo = E.obs[:, None]                                  # (S, 1, W, K)
    Kp = d.K

    def padK(a, fill=0.0):
        return jnp.concatenate(
            [a, jnp.full(a.shape[:-1] + (Kp - a.shape[-1],), fill,
                         a.dtype)], axis=-1)

    gx = padK(qps.G[..., 0] * Eo)
    gy = padK(qps.G[..., 1] * Eo)
    gz = padK(qps.G[..., 2] * Eo)
    s3 = padK(-(qps.obs_dyn * qps.obs_slack) * Eo)
    s4 = padK(-((1.0 - qps.obs_dyn) * qps.obs_active * qps.obs_slack) * Eo)
    rho_obs = padK(rho.obs, fill=1e-6)
    lo_obs = padK(jnp.nan_to_num(qps.l.obs * Eo, neginf=-big), fill=-big)

    # D on the p/slack columns feeding the obstacle math is already in
    # the copy rows (they copy D*x), so gx..s4 need no extra D.

    def pad_scen(a):   # (S, n) -> (S, n_pad)
        return jnp.concatenate(
            [a, jnp.zeros((a.shape[0], d.n_pad - a.shape[1]), a.dtype)],
            axis=1)

    def pad_cand(a):   # (S, 6, n) -> (S, 6, n_pad)
        return jnp.concatenate(
            [a, jnp.zeros(a.shape[:2] + (d.n_pad - a.shape[2],), a.dtype)],
            axis=2)

    # The inverse must ship as FULL f32 and its dots must run at
    # HIGHEST (bf16x6): on the chronically-infeasible DYNUS regime the
    # obstacle duals ramp to ~1e4-1e5 while x stays ~1e1, so the
    # x-update is pure cancellation and needs ~1e-7-relative dots. Both
    # cheaper variants were built and measured to diverge on hardware
    # (4/32 scenarios NaN by ~iteration 15; f32 interpret converges):
    # bf16 single-pass (4e-3 rel), and a split bf16 hi+lo pair with
    # 3-pass dots (1.6e-5 rel) — even when only the refinement dots
    # used the split. See RESULTS.md round-2 kernel post-mortem.
    minv_pad = jnp.zeros((S, d.n_pad, d.n_pad), jnp.float32)
    minv_pad = minv_pad.at[:, :n, :n].set(minv)

    a_ext = jnp.asarray(_a_ext(cfg, K, S))
    return FleetProblem(
        a_ext=a_ext, minv=minv_pad,
        d_scale=lanes_shared(pad_scen(D)),
        e_lin=lanes_shared(e_lin),
        q=lanes(pad_cand(q_s)),
        hsig=lanes_shared(pad_scen(h_s)) + scfg.sigma,
        x0=lanes(pad_cand(warm / D[:, None, :])),
        rho_lin=lanes(rho_lin, fill=1e-6),
        ir_lin=lanes(1.0 / rho_lin, fill=1e6),
        lo_lin=lanes(lo_lin, fill=-big),
        hi_lin=lanes(hi_lin, fill=big),
        gx=lanes(gx), gy=lanes(gy), gz=lanes(gz), s3=lanes(s3),
        s4=lanes(s4),
        rho_obs=lanes(rho_obs, fill=1e-6),
        ir_obs=lanes(1.0 / rho_obs, fill=1e6),
        lo_obs=lanes(lo_obs, fill=-big),
    )


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _fleet_kernel(dims: FleetDims, iters: int, refine: int, sigma: float,
                  alpha: float, s_cell: int,
                  a_ref, minv_hbm, d_ref, el_ref, q_ref,
                  hs_ref, x0_ref, rl_ref, irl_ref, lol_ref, hil_ref,
                  gx_ref, gy_ref, gz_ref, s3_ref, s4_ref, ro_ref, iro_ref,
                  loo_ref, x_out, yl_out, yo_out,
                  minv_ref, dma_sem):
    f32 = jnp.float32
    W, K = dims.W, dims.K
    lp, Wp = dims.lin_pad, dims.Wp
    S = s_cell
    P = 8 * s_cell            # lanes in this cell

    # single-buffered manual DMA of this cell's inverse stack: the
    # pipelined (double-buffered) window would not fit the 128 MB VMEM
    g = pl.program_id(0)
    dma = pltpu.make_async_copy(minv_hbm.at[pl.ds(g * S, S)], minv_ref,
                                dma_sem)
    dma.start()
    dma.wait()

    # per-scenario lane masks (lanes 8s..8s+8), built in place of an input
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   precision=_PREC,
                                   preferred_element_type=f32)

    # NOTE: every operand is re-read from its VMEM ref at each use —
    # reading them once into values at kernel top makes Mosaic hold all
    # inputs live as vregs for the whole loop (measured: 97.7 MB of
    # register spill slots, VMEM OOM).

    def a_s(x):
        """Scaled constraint matvec: (lin rows (lp,P), obs rows (W,K,P))."""
        t = d_ref[...] * x
        ext = dot(a_ref[...], t)                # (n_ext, P)
        zl = el_ref[...] * ext[:lp]
        px = ext[lp:lp + W]
        py = ext[lp + Wp:lp + Wp + W]
        pz = ext[lp + 2 * Wp:lp + 2 * Wp + W]
        u3 = ext[lp + 3 * Wp:lp + 3 * Wp + W]
        u4 = ext[lp + 4 * Wp:lp + 4 * Wp + W]
        zo = (gx_ref[...] * jnp.expand_dims(px, 1)
              + gy_ref[...] * jnp.expand_dims(py, 1)
              + gz_ref[...] * jnp.expand_dims(pz, 1)
              + s3_ref[...] * jnp.expand_dims(u3, 1)
              + s4_ref[...] * jnp.expand_dims(u4, 1))
        return zl, zo

    def at_s(wl, wo):
        """Transpose: back to x space (n_pad, P)."""
        cx = jnp.sum(wo * gx_ref[...], axis=1)  # (W, P)
        cy = jnp.sum(wo * gy_ref[...], axis=1)
        cz = jnp.sum(wo * gz_ref[...], axis=1)
        c3 = jnp.sum(wo * s3_ref[...], axis=1)
        c4 = jnp.sum(wo * s4_ref[...], axis=1)

        def padW(v):
            return jnp.concatenate(
                [v, jnp.zeros((Wp - W, P), f32)], axis=0)

        w_ext = jnp.concatenate(
            [el_ref[...] * wl, padW(cx), padW(cy), padW(cz), padW(c3),
             padW(c4)], axis=0)                  # (n_ext, P)
        atw = jax.lax.dot_general(
            a_ref[...], w_ext, (((0,), (0,)), ((), ())),
            precision=_PREC, preferred_element_type=f32)
        return d_ref[...] * atw

    def m_apply(x):
        # hsig already carries the sigma shift (pack_fleet)
        zl, zo = a_s(x)
        return hs_ref[...] * x + at_s(rl_ref[...] * zl, ro_ref[...] * zo)

    def msolve(rhs):
        def inv_dot(r):
            acc = jnp.zeros(r.shape, f32)
            for s in range(S):
                xs = dot(minv_ref[s], r)
                m = ((lane_idx >= 8 * s) & (lane_idx < 8 * s + 8)
                     ).astype(f32)
                acc = acc + xs * m
            return acc
        x = inv_dot(rhs)
        for _ in range(refine):
            x = x + inv_dot(rhs - m_apply(x))
        return x

    x = x0_ref[...]
    zl0, zo0 = a_s(x)

    def body(_, carry):
        x, zl, zo, yl, yo = carry
        rhs = sigma * x - q_ref[...] \
            + at_s(rl_ref[...] * zl - yl, ro_ref[...] * zo - yo)
        xt = msolve(rhs)
        ztl, zto = a_s(xt)
        x_n = alpha * xt + (1.0 - alpha) * x
        zrl = alpha * ztl + (1.0 - alpha) * zl
        zro = alpha * zto + (1.0 - alpha) * zo
        zl_n = jnp.clip(zrl + yl * irl_ref[...], lol_ref[...], hil_ref[...])
        zo_n = jnp.maximum(zro + yo * iro_ref[...], loo_ref[...])
        yl_n = yl + rl_ref[...] * (zrl - zl_n)
        yo_n = yo + ro_ref[...] * (zro - zo_n)
        return (x_n, zl_n, zo_n, yl_n, yo_n)

    x, zl, zo, yl, yo = jax.lax.fori_loop(
        0, iters, body,
        (x, zl0, zo0, jnp.zeros_like(zl0), jnp.zeros_like(zo0)))
    x_out[...] = x
    yl_out[...] = yl
    yo_out[...] = yo


def fleet_solve(cfg: PlannerConfig, fp: FleetProblem, iters: int,
                refine: int, interpret: bool = False,
                scenarios_per_cell: int = 16):
    """Run the fused fleet kernel; returns scaled (x, z_lin, z_obs,
    y_lin, y_obs) in the lane layout.

    The grid tiles scenarios into cells of `scenarios_per_cell` (128
    lanes — exactly one lane tile) so each cell's working set (its
    slice of the inverse stack + problem data + iterates) fits the
    v5e's 128 MB physical VMEM; the shared A_ext operator re-DMAs per
    cell (3 MB, amortized over the full iteration budget)."""
    scfg = cfg.solver
    S = fp.minv.shape[0]
    K = fp.gx.shape[1]
    d = fleet_dims(cfg, K, S)
    sc = min(scenarios_per_cell, S)
    while S % sc != 0:         # largest divisor of S within the cap
        sc -= 1
    G = S // sc
    Pc = 8 * sc
    kern = functools.partial(_fleet_kernel, d, iters, refine,
                             scfg.sigma, scfg.alpha, sc)
    P = d.P

    def shared(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda g: (0,) * nd)

    def lanes2(rows):
        return pl.BlockSpec((rows, Pc), lambda g: (0, g))

    def lanes3(a, b):
        return pl.BlockSpec((a, b, Pc), lambda g: (0, 0, g))

    in_specs = [
        shared((d.n_ext, d.n_pad)),              # a_ext
        pl.BlockSpec(memory_space=pltpu.ANY) if (_HAS_PLTPU and
                                                 not interpret)
        else pl.BlockSpec(memory_space=pl.ANY),  # minv stays in HBM
        lanes2(d.n_pad),                         # d_scale
        lanes2(d.lin_pad),                       # e_lin
        lanes2(d.n_pad),                         # q
        lanes2(d.n_pad),                         # hsig
        lanes2(d.n_pad),                         # x0
        lanes2(d.lin_pad),                       # rho_lin
        lanes2(d.lin_pad),                       # ir_lin
        lanes2(d.lin_pad),                       # lo_lin
        lanes2(d.lin_pad),                       # hi_lin
        lanes3(d.W, K), lanes3(d.W, K), lanes3(d.W, K),   # gx gy gz
        lanes3(d.W, K), lanes3(d.W, K),                   # s3 s4
        lanes3(d.W, K), lanes3(d.W, K), lanes3(d.W, K),   # rho ir lo obs
    ]
    out_shapes = (
        jax.ShapeDtypeStruct((d.n_pad, P), jnp.float32),
        jax.ShapeDtypeStruct((d.lin_pad, P), jnp.float32),
        jax.ShapeDtypeStruct((d.W, K, P), jnp.float32),
    )
    out_specs = (
        lanes2(d.n_pad), lanes2(d.lin_pad), lanes3(d.W, K),
    )
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024)
    scratch = [
        pltpu.VMEM((sc, d.n_pad, d.n_pad), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(fp.a_ext, fp.minv, fp.d_scale, fp.e_lin,
      fp.q, fp.hsig, fp.x0, fp.rho_lin, fp.ir_lin, fp.lo_lin, fp.hi_lin,
      fp.gx, fp.gy, fp.gz, fp.s3, fp.s4, fp.rho_obs, fp.ir_obs, fp.lo_obs)


def unpack_x(cfg: PlannerConfig, x_lanes: jnp.ndarray, D: jnp.ndarray,
             S: int) -> jnp.ndarray:
    """(n_pad, 8S) scaled -> (S, 6, n) unscaled."""
    n = cfg.num_vars
    x = jnp.moveaxis(x_lanes[:n], -1, 0).reshape(S, 8, n)[:, :6]
    return x * D[:, None, :]


# ---------------------------------------------------------------------------
# High-level entry: solve a whole fleet's candidate QPs in one kernel call
# ---------------------------------------------------------------------------

def fleet_admm(cfg: PlannerConfig, qps: QPData, warm: jnp.ndarray,
               max_iter: Optional[int] = None,
               scfg: Optional[SolverConfig] = None,
               rho_override=None,
               interpret: Optional[bool] = None,
               feas_tol: float = 5e-2):
    """Solve (S, 6) candidate QPs with per-scenario shared factors via the
    fused kernel. Mirrors the XLA shared-factor path of admm_solve:
    factor the union-activity candidate-mean QP per scenario (XLA;
    structured block Cholesky), run all iterations in one VMEM-resident
    kernel, refine each x-update against the candidate's own normal
    matrix `shared_refine_iters` times in closed form. The in-kernel
    recurrence is STATIONARY refinement (x += Minv r); the XLA path's
    production default is preconditioned-CG refinement
    (SolverConfig.shared_refine_mode="cg"), so exact-iterate comparisons
    against the kernel must pin the XLA path to "stationary".

    Returns an ADMMResult with leaves batched (S, 6, ...).
    """
    from intent_mpc_tpu.ops.admm import ADMMResult, admm_factor
    scfg = scfg or cfg.solver
    iters = max_iter if max_iter is not None else scfg.max_iter
    S = qps.q.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    qp_mean = jax.tree.map(lambda a: jnp.mean(a, axis=1), qps)
    qp_mean = qp_mean._replace(obs_active=jnp.max(qps.obs_active, axis=1))
    if rho_override is None:
        rho_override = jnp.full((S,), scfg.rho)
    fac = jax.vmap(lambda q, r: admm_factor(cfg, q, scfg=scfg,
                                            rho_override=r))(qp_mean,
                                                             rho_override)

    fp = pack_fleet(cfg, qps, fac.Minv, fac.D, fac.E, fac.c, warm, scfg)
    x_l, yl_l, yo_l = fleet_solve(
        cfg, fp, iters, scfg.shared_refine_iters, interpret=interpret)

    x = unpack_x(cfg, x_l, fac.D, S)                    # (S, 6, n)

    # duals back to ConVec, unscaled (XLA path: y = ys.scale(E) / c)
    H, W = cfg.horizon, cfg.mpc_window
    K = qps.G.shape[-2]
    d = fleet_dims(cfg, K, S)

    def unlane(a_l, rows):
        v = jnp.moveaxis(a_l[:rows], -1, 0).reshape(S, 8, rows)[:, :6]
        return v

    y_lin = unlane(yl_l, d.m_lin)                       # (S, 6, m_lin)
    y_obs = jnp.moveaxis(yo_l, -1, 0).reshape(
        (S, 8) + yo_l.shape[:-1])[:, :6, :, :K]         # (S, 6, W, K)
    s0, s1 = NX * H, 2 * NX * H
    y = ConVec(eq=y_lin[..., :s0].reshape(S, 6, H, NX),
               sb=y_lin[..., s0:s1].reshape(S, 6, H, NX),
               cb=y_lin[..., s1:].reshape(S, 6, W, NU),
               obs=y_obs)
    cinv = 1.0 / fac.c[:, None, None, None]
    y = ConVec(eq=y.eq * fac.E.eq[:, None] * cinv,
               sb=y.sb * fac.E.sb[:, None] * cinv,
               cb=y.cb * fac.E.cb[:, None] * cinv,
               obs=y.obs * fac.E.obs[:, None] * cinv)

    def residuals(qp, xi):
        ax = qplib.a_matvec(cfg, qp, xi)
        z = ax.map(lambda a, li, ui: jnp.clip(a, li, ui), qp.l, qp.u)
        return (ax - z).inf_norm()

    prim = jax.vmap(jax.vmap(residuals))(qps, x)
    return ADMMResult(
        x=x, y=y, prim_res=prim,
        dual_res=jnp.full_like(prim, jnp.nan),
        solved=prim < feas_tol,
        rho_suggest=jnp.full_like(prim, scfg.rho))

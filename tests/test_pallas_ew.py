"""Fused elementwise ADMM-chain kernel (ops/pallas_ew.py).

Pins: (1) the Pallas kernel (interpret mode) against the plain-jnp
reference of the exact grouped-chain math, including batched entry
through the custom_vmap collapse; (2) the solver-level switch — an
admm_solve with ew_kernel=True reproduces the default grouped path's
iterates on CPU (same math, different fusion)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from intent_mpc_tpu.ops import pallas_ew as pe
from intent_mpc_tpu.ops.admm import admm_factor, admm_solve
from intent_mpc_tpu.ops.qp import ConVec
from intent_mpc_tpu.utils.config import PlannerConfig, SolverConfig

from test_qp import _build_both


def _rand_convec(key, H, W, K, lo=-2.0, hi=2.0):
    ks = jax.random.split(key, 4)
    return ConVec(
        eq=jax.random.uniform(ks[0], (H, 8), minval=lo, maxval=hi),
        sb=jax.random.uniform(ks[1], (H, 8), minval=lo, maxval=hi),
        cb=jax.random.uniform(ks[2], (W, 5), minval=lo, maxval=hi),
        obs=jax.random.uniform(ks[3], (W, K), minval=lo, maxval=hi))


def test_kernel_matches_reference_batched():
    H, W, K, n = 10, 9, 8, 125
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    alpha = 1.6

    def one(k):
        kk = jax.random.split(k, 8)
        x = jax.random.normal(kk[0], (n,))
        x_t = jax.random.normal(kk[1], (n,))
        z = _rand_convec(kk[2], H, W, K)
        y = _rand_convec(kk[3], H, W, K)
        zt = _rand_convec(kk[4], H, W, K)
        rho = _rand_convec(kk[5], H, W, K, 0.05, 2.0)
        l = _rand_convec(kk[6], H, W, K, -3.0, 0.0)
        u = _rand_convec(kk[7], H, W, K, 0.0, 3.0)
        return x, x_t, z, y, zt, rho, l, u

    args = jax.vmap(one)(ks)   # batch of 10

    ref = jax.vmap(lambda *a: pe.ew_reference(alpha, *a))(*args)
    # interpret-mode kernel through the custom_vmap collapse (one vmap
    # level); use_pallas forced on so the CPU test exercises the kernel
    got = jax.vmap(lambda *a: pe.ew_chain(alpha, *a, use_pallas=True,
                                          interpret=True))(*args)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   atol=1e-6, rtol=1e-6)

    # two nested vmap levels (the engine's scenario x candidate shape)
    args2 = jax.tree.map(lambda a: jnp.stack([a, a]), args)
    got2 = jax.jit(jax.vmap(jax.vmap(
        lambda *a: pe.ew_chain(alpha, *a, use_pallas=True,
                               interpret=True))))(*args2)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got2)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g[0]),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g[1]),
                                   atol=0)


def test_solver_ew_matches_grouped():
    """admm_solve with ew_kernel=True (jnp fallback path on CPU)
    reproduces the shared-factor grouped path."""
    cfg = PlannerConfig(horizon=10, max_obstacles=4,
                        solver=SolverConfig(max_iter=60))
    qp, _, _ = _build_both(cfg, 4, 2, seed=1)
    fac = admm_factor(cfg, qp)
    r_def = admm_solve(cfg, qp, factor=fac)
    sc = dataclasses.replace(cfg.solver, ew_kernel=True)
    cfg_ew = dataclasses.replace(cfg, solver=sc)
    r_ew = admm_solve(cfg_ew, qp, factor=fac)
    np.testing.assert_allclose(np.asarray(r_ew.x), np.asarray(r_def.x),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(r_ew.prim_res), float(r_def.prim_res),
                               atol=1e-4, rtol=1e-3)

"""Pallas fused-ADMM kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.utils.config import PlannerConfig, SolverConfig
from intent_mpc_tpu.ops import qp as qplib
from intent_mpc_tpu.ops import admm
import tests.test_qp as tq


@pytest.fixture(scope="module")
def cfg():
    # structured_factor=False + refine_iters=0: this test checks the
    # *iteration loop* equivalence, so the setup must be held
    # bitwise-identical across the two paths. The dense Cholesky is a
    # LAPACK custom call (same bits in any compilation context); the
    # structured factorization is fusible XLA ops whose last-bit rounding
    # varies with the surrounding program. Likewise refine_iters=0 (the
    # production default): the XLA path refines against the closed-form
    # m_apply while the kernel refines against the dense M — same math,
    # different rounding, and cond(M)~1e5 amplifies those ulps past any
    # useful tolerance over 150 iterations.
    return PlannerConfig(horizon=10, max_obstacles=4,
                         solver=SolverConfig(max_iter=150, refine_iters=0,
                                             structured_factor=False))


def test_pallas_matches_xla_path(cfg):
    K = cfg.max_obstacles
    qp, _, _ = tq._build_both(cfg, K, 3, with_static=True)
    qps = jax.tree.map(lambda a: jnp.stack([a, a]), qp)
    x0 = jnp.zeros((2, cfg.num_vars))

    ref = jax.vmap(lambda q, x: admm.admm_solve(cfg, q, x, 150))(qps, x0)
    out = admm.admm_solve_pallas(cfg, qps, x0, 150, interpret=True)

    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=2e-3, atol=2e-3)
    # same iterate as the XLA path => same (still-converging) residual scale
    assert float(out.prim_res[0]) < 0.5

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
    return PlannerConfig(horizon=10, max_obstacles=4,
                         solver=SolverConfig(max_iter=150, refine_iters=1))


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

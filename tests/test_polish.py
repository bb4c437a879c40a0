"""Active-set polish (ops/polish.py): exactness, gating, and batching.

Mirrors the role of OSQP's polish tests: a converged iterate polishes to
the oracle's optimum; an unconverged iterate is safely rejected (the
original solution passes through unchanged, matching numpy_ref._polish's
None-return semantics); and the whole routine vmaps for the engine path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.utils.config import PlannerConfig, SolverConfig
from intent_mpc_tpu.ops.admm import admm_solve
from intent_mpc_tpu.ops import polish as pol
from intent_mpc_tpu.oracle import numpy_ref
import tests.test_qp as tq


@pytest.fixture(scope="module")
def cfg():
    return PlannerConfig(horizon=10, max_obstacles=4,
                         solver=SolverConfig(max_iter=800, refine_iters=1))


@pytest.mark.parametrize("seed", [0, 3, 11])
def test_polish_matches_oracle(cfg, seed):
    qp, (P, q, A, l, u), _ = tq._build_both(cfg, 4, 3, seed=seed,
                                            with_static=True)
    x_c, _ = numpy_ref.solve_qp_dense(P, q, A, l, u, max_iter=20000,
                                      eps=1e-10, polish=True)
    res = admm_solve(cfg, qp)
    pr = pol.polish(cfg, qp, res.x, res.y)
    assert bool(pr.accepted), f"seed {seed}: polish rejected"
    H, W = cfg.horizon, cfg.mpc_window
    x = np.asarray(pr.x, np.float64)
    pos = np.abs(x[:8 * H].reshape(H, 8)[:, :3]
                 - x_c[:8 * H].reshape(H, 8)[:, :3]).max()
    acc = np.abs(x[8 * H:].reshape(W, 5)[:, :3]
                 - x_c[8 * H:].reshape(W, 5)[:, :3]).max()
    assert pos < 1e-3, f"seed {seed}: pos {pos:.2e}"
    assert acc < 1e-1, f"seed {seed}: acc {acc:.2e}"


def test_polish_rejected_passes_through(cfg):
    """A hopelessly loose iterate must come back unchanged (the gate
    mirrors numpy_ref._polish returning None on violation)."""
    qp, _, _ = tq._build_both(cfg, 4, 3, with_static=True)
    res = admm_solve(cfg, qp, max_iter=3)     # nowhere near converged
    pr = pol.polish(cfg, qp, res.x, res.y)
    if not bool(pr.accepted):
        np.testing.assert_array_equal(np.asarray(pr.x), np.asarray(res.x))
    else:
        # if it *was* accepted the gate certified feasibility: verify
        from intent_mpc_tpu.ops import qp as qplib
        z = qplib.a_matvec(cfg, qp, pr.x)
        viol = z.map(lambda zi, li, ui: jnp.max(jnp.maximum(
            jnp.maximum(li - zi, zi - ui), 0.0)), qp.l, qp.u)
        for group in viol:
            assert float(group) < 5e-4


def test_polish_vmaps(cfg):
    """Batched polish (the engine's chosen-candidate path) equals the
    sequential calls."""
    qps, xs, ys = [], [], []
    for seed in (0, 3):
        qp, _, _ = tq._build_both(cfg, 4, 3, seed=seed, with_static=True)
        res = admm_solve(cfg, qp)
        qps.append(qp)
        xs.append(res.x)
        ys.append(res.y)
    qp_b = jax.tree.map(lambda *a: jnp.stack(a), *qps)
    x_b = jnp.stack(xs)
    y_b = jax.tree.map(lambda *a: jnp.stack(a), *ys)
    out_b = jax.vmap(lambda q, x, y: pol.polish(cfg, q, x, y))(qp_b, x_b, y_b)
    for i in range(2):
        single = pol.polish(cfg, qps[i], xs[i], ys[i])
        np.testing.assert_allclose(np.asarray(out_b.x[i]),
                                   np.asarray(single.x), rtol=0, atol=1e-5)
        assert bool(out_b.accepted[i]) == bool(single.accepted)

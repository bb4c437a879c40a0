"""Native C++ QP solver vs numpy oracle."""

import numpy as np
import pytest

from intent_mpc_tpu.utils.config import PlannerConfig
from intent_mpc_tpu.oracle import native, numpy_ref
import tests.test_qp as tq


@pytest.fixture(scope="module")
def problem():
    cfg = PlannerConfig(horizon=10)
    x0, xref, oxyz, osize, yaw, is_dyn, active, lin = tq._random_problem(
        cfg, 3, 3, with_static=True)
    P, q, A, l, u = numpy_ref.build_reference_qp(
        cfg, x0, xref, oxyz, osize, yaw, is_dyn, lin)
    return P, q, A, l, u


def test_native_builds():
    assert native.available(), "g++ build of libintentqp.so failed"


def test_native_matches_numpy_oracle(problem):
    P, q, A, l, u = problem
    x_np, _ = numpy_ref.solve_qp_dense(P, q, A, l, u, max_iter=20000,
                                       eps=1e-10, polish=True)
    x_c, y_c, status, iters = native.solve_qp(np.diag(P), q, A, l, u,
                                              max_iter=20000, eps=1e-10)
    assert status == 0, f"native solver did not converge in {iters} iters"
    np.testing.assert_allclose(x_c, x_np, atol=1e-5)


def test_batch_solver_matches_sequential():
    """imt_solve_qp_batch (the std::thread parallel executor used by
    oracle-in-the-loop runs) must reproduce the sequential entry exactly
    on every stacked problem, including warm starts (a zero warm row is
    identical to a cold start inside the solver)."""
    import numpy as np
    from intent_mpc_tpu.oracle import native
    if not native.available():
        import pytest
        pytest.skip("native solver unavailable")
    rng = np.random.default_rng(3)
    n, m, P = 16, 24, 5
    h = np.abs(rng.normal(1.0, 0.2, n)) + 0.5
    q = rng.normal(size=(P, n))
    A = rng.normal(size=(P, m, n))
    xs = rng.normal(size=(P, n))
    ax = np.einsum("pmn,pn->pm", A, xs)
    l = ax - np.abs(rng.normal(size=(P, m))) - 0.1
    u = ax + np.abs(rng.normal(size=(P, m))) + 0.1
    warm = rng.normal(size=(P, n))
    warm[2] = 0.0  # cold-start row
    xb, yb, st, it = native.solve_qp_batch(h, q, A, l, u, x0=warm)
    for i in range(P):
        x0 = warm[i] if np.any(warm[i] != 0.0) else None
        xi, yi, sti, iti = native.solve_qp(h, q[i], A[i], l[i], u[i], x0=x0)
        np.testing.assert_allclose(xb[i], xi, atol=1e-12)
        np.testing.assert_allclose(yb[i], yi, atol=1e-12)
        assert st[i] == sti and it[i] == iti

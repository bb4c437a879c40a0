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

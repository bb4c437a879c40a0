"""Full benchmark-scale parity: horizon-30 QP vs the native C++ f64 oracle,
and intent-candidate construction vs literal reference logic."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.utils.config import PlannerConfig, SolverConfig
from intent_mpc_tpu.ops import qp as qplib
from intent_mpc_tpu.ops.admm import admm_solve
from intent_mpc_tpu.oracle import native, numpy_ref
from intent_mpc_tpu.models import mpc as mpclib
from intent_mpc_tpu.models.predictor import Prediction
import tests.test_qp as tq


def test_horizon30_qp_matches_native_oracle():
    """The real benchmark QP size (385 vars, 30-step horizon, obstacle
    rows) solved by the f32 runtime path vs the C++ f64 oracle."""
    cfg = PlannerConfig(horizon=30, max_obstacles=8,
                        solver=SolverConfig(max_iter=2000, refine_iters=1))
    qp, (P, q, A, l, u), _ = tq._build_both(cfg, 8, 4, with_static=True)
    # polished f64 oracle (the ADMM tail alone needs ~1e5 iterations at
    # this scale; polish lands the exact active set)
    x_c, _ = numpy_ref.solve_qp_dense(P, q, A, l, u, max_iter=20000,
                                      eps=1e-9, polish=True)
    zc = A @ x_c
    viol = max(np.clip(l - zc, 0, None).max(), np.clip(zc - u, 0, None).max())
    assert viol < 1e-5, f"oracle solution violates constraints ({viol})"
    res = admm_solve(cfg, qp)
    x = np.asarray(res.x, np.float64)
    H, W = cfg.horizon, cfg.mpc_window
    pos = x[:8 * H].reshape(H, 8)[:, :3]
    pos_ref = x_c[:8 * H].reshape(H, 8)[:, :3]
    acc = x[8 * H:].reshape(W, 5)[:, :3]
    acc_ref = x_c[8 * H:].reshape(W, 5)[:, :3]
    assert np.abs(pos - pos_ref).max() < 2e-2
    # accelerations are the most active-set-sensitive quantities and the
    # velocity weight is 0 (near-flat directions): f32-vs-polished-f64
    # differences of ~1 m/s^2 (5% of the 20 limit) occur at constraint
    # switches while positions agree to 2e-2
    assert np.abs(acc - acc_ref).max() < 1.5


def _ref_candidates(pred_pos, pred_size, probs, closest, visible):
    """Literal getIntentComb (mpcPlanner.cpp:710-769): ordered combo lists."""
    STOP, LEFT, RIGHT, FORWARD = 3, 1, 2, 0
    O = pred_pos.shape[0]
    w = [(probs[closest][STOP], 0), (probs[closest][LEFT], 1),
         (probs[closest][RIGHT], 2), (probs[closest][FORWARD], 3),
         (max(probs[closest][LEFT], probs[closest][FORWARD]), 4),
         (max(probs[closest][RIGHT], probs[closest][FORWARD]), 5)]
    w_sorted = sorted(w)            # ascending (prob, idx)
    combo_first = [STOP, LEFT, RIGHT, FORWARD, LEFT, RIGHT]
    combo_second = [None, None, None, None, FORWARD, FORWARD]
    out = []
    for i in range(6):
        combo = w_sorted[5 - i][1]
        series = [pred_pos[closest][combo_first[combo]]]
        if combo_second[combo] is not None:
            series.append(pred_pos[closest][combo_second[combo]])
        for j in range(O):
            if j != closest and visible[j]:
                series.append(pred_pos[j][int(np.argmax(probs[j]))])
        out.append(series)
    return out


def test_candidate_construction_matches_reference():
    rng = np.random.RandomState(7)
    cfg = PlannerConfig(horizon=6)
    O, P1 = 4, cfg.horizon + 1
    pred_pos = rng.randn(O, 4, P1, 3)
    pred_size = np.abs(rng.randn(O, 4, P1, 3)) + 1
    probs = rng.dirichlet(np.ones(4), size=O)
    visible = np.array([True, True, False, True])
    closest = 1

    pred = Prediction(pos=jnp.asarray(pred_pos),
                      size=jnp.asarray(pred_size),
                      intent_prob=jnp.asarray(probs))
    cp, cs, ca = mpclib.build_candidates(cfg, pred, jnp.asarray(visible),
                                         jnp.asarray(closest))
    w6 = mpclib.intent_comb_weights(pred.intent_prob[closest])
    order = np.asarray(jnp.flip(jnp.argsort(w6, stable=True)))
    cp = np.asarray(cp)[order]       # (6, H, K, 3)
    ca = np.asarray(ca)[order]

    ref = _ref_candidates(pred_pos[:, :, :cfg.horizon], pred_size, probs,
                          closest, visible)
    for i in range(6):
        ours = []
        # slot layout: closest at its index, second series at slot O
        K = O + 1
        for k in [closest] + ([O] if ca[i][O] > 0 else []) \
                + [j for j in range(O) if j != closest and visible[j]]:
            if ca[i][k] > 0:
                ours.append(cp[i, :, k, :])
        assert len(ours) == len(ref[i]), (i, len(ours), len(ref[i]))
        for a, b in zip(ours, ref[i]):
            np.testing.assert_allclose(a, b, atol=1e-6)

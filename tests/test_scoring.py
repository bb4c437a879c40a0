"""Candidate scoring parity: vectorized _scores/evaluate_candidates vs a
literal numpy transcription of mpcPlanner.cpp:771-887."""

import numpy as np
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.utils.config import PlannerConfig
from intent_mpc_tpu.models import mpc as mpclib


def ref_consistency(prev_states, states, first_time):
    """getConsistencyScore (mpcPlanner.cpp:780-800)."""
    if first_time or len(prev_states) == 0 or len(states) == 0:
        return 0.0
    max_step = min(10, len(prev_states), len(states))
    total = sum(np.linalg.norm(prev_states[i][:3] - states[i][:3])
                for i in range(max_step)) / max_step
    return max(total, 0.1)


def ref_detour(states, xref):
    """getDetourScore (:802-814)."""
    total = sum(np.linalg.norm(xref[i][:3] - states[i][:3])
                for i in range(len(states))) / len(states)
    return max(total, 0.1)


def ref_safety(states, obs_pos, obs_size, dyn_safety):
    """getSafetyScore (:816-848), dynamic obstacles only."""
    total = 0.0
    for i in range(len(states)):
        pos = np.array([states[i][0], states[i][1], 0.0])
        dist = 0.0
        tw = 0.0
        for j in range(len(obs_pos)):
            op = obs_pos[j][i].copy()
            op[2] = 0.0
            ms = np.sqrt(obs_size[j][i][0] ** 2 + obs_size[j][i][1] ** 2)
            d = np.linalg.norm(pos - op)
            w = 1.0 - np.tanh(np.arctanh(0.5) / (dyn_safety + ms) * d)
            dist += d * w
            tw += w
        total += dist / tw
    return total / len(states)


def ref_evaluate(traj_scores, weights):
    """evaluateTraj (:850-887) with all candidates successful."""
    cons = [s[0] for s in traj_scores]
    det = [s[1] for s in traj_scores]
    saf = [s[2] for s in traj_scores]
    ca, da, sa = np.mean(cons), np.mean(det), np.mean(saf)
    cons = [ca / c for c in cons]
    det = [da / d for d in det]
    saf = [s / sa for s in saf]
    weighted = [weights[i] * (cons[i] + det[i] + saf[i])
                for i in range(len(traj_scores))]
    return int(np.argmax(weighted))


@pytest.fixture(scope="module")
def cfg():
    return PlannerConfig(horizon=12)


def test_scores_match_reference(cfg):
    rng = np.random.RandomState(3)
    H = cfg.horizon
    K = 3
    cand = rng.randn(6, H, 8) * 2.0
    prev = rng.randn(H, 8) * 2.0
    xref = rng.randn(H, 3) * 2.0
    obs_pos = rng.randn(6, H, K, 3) * 3.0
    obs_size = np.abs(rng.randn(6, H, K, 3)) + 1.0
    active = np.ones((6, K))

    c, d, s = mpclib._scores(cfg, jnp.asarray(cand), jnp.asarray(prev),
                             jnp.asarray(True), jnp.asarray(xref),
                             jnp.asarray(obs_pos), jnp.asarray(obs_size),
                             jnp.asarray(active))
    for i in range(6):
        rc = ref_consistency([prev[t] for t in range(H)],
                             [cand[i, t] for t in range(H)], False)
        rd = ref_detour([cand[i, t] for t in range(H)], xref)
        rs = ref_safety([cand[i, t] for t in range(H)],
                        [[obs_pos[i, t, j] for t in range(H)]
                         for j in range(K)],
                        [[obs_size[i, t, j] for t in range(H)]
                         for j in range(K)],
                        cfg.dynamic_safety_dist)
        np.testing.assert_allclose(float(c[i]), rc, rtol=1e-4)
        np.testing.assert_allclose(float(d[i]), rd, rtol=1e-4)
        np.testing.assert_allclose(float(s[i]), rs, rtol=1e-4)


def test_evaluate_matches_reference(cfg):
    rng = np.random.RandomState(5)
    for trial in range(10):
        cons = np.maximum(rng.rand(6) * 3, 0.1)
        det = np.maximum(rng.rand(6) * 3, 0.1)
        saf = rng.rand(6) * 2 + 0.1
        w = rng.rand(6)
        best_ref = ref_evaluate(list(zip(cons, det, saf)), w)
        best = mpclib.evaluate_candidates(
            cfg, jnp.asarray(cons), jnp.asarray(det), jnp.asarray(saf),
            jnp.asarray(w), jnp.ones(6, bool))
        assert int(best) == best_ref, trial


def test_intent_comb_weights_order():
    prob = jnp.asarray([0.1, 0.2, 0.3, 0.4])   # F, L, R, S
    w = np.asarray(mpclib.intent_comb_weights(prob))
    # [STOP, LEFT, RIGHT, FORWARD, max(L,F), max(R,F)]
    np.testing.assert_allclose(w, [0.4, 0.2, 0.3, 0.1, 0.2, 0.3])

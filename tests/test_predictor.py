"""Predictor parity: vectorized JAX predictor vs literal numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.utils.config import PredictorConfig
from intent_mpc_tpu.models import predictor as pred
from intent_mpc_tpu.models.occupancy import empty_grid
from intent_mpc_tpu.oracle import predictor_ref as ref


@pytest.fixture(scope="module")
def cfg():
    return PredictorConfig()


def _history(seed=0, O=3, Hh=20):
    """Synthesize smooth obstacle histories (newest at index 0)."""
    rng = np.random.RandomState(seed)
    pos = np.zeros((O, Hh, 3))
    vel = np.zeros((O, Hh, 3))
    for o in range(O):
        p = rng.uniform(-5, 5, 3)
        p[2] = 2.0
        heading = rng.uniform(-np.pi, np.pi)
        speed = rng.uniform(0.3, 1.2)
        ps = []
        for _ in range(Hh):
            ps.append(p.copy())
            heading += rng.uniform(-0.3, 0.3)
            p = p + np.array([np.cos(heading), np.sin(heading), 0]) * speed / 30.0
        ps = ps[::-1]  # newest first
        pos[o] = np.array(ps)
        v = (pos[o, :-1] - pos[o, 1:]) * 30.0
        vel[o, :-1] = v
        vel[o, -1] = v[-1]
        vel[o, :, 2] = 0.0
    return pos, vel


def test_intent_probabilities_match_reference(cfg):
    pos, vel = _history()
    O, Hh, _ = pos.shape
    p_ref = ref.intent_prob(cfg, list(pos), list(vel))
    p = np.asarray(pred.intent_probabilities(
        cfg, jnp.asarray(pos), jnp.asarray(vel),
        jnp.full(O, Hh)))
    np.testing.assert_allclose(p, p_ref, atol=2e-4)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-4)


def test_intent_probabilities_partial_history(cfg):
    """Ring buffer not yet full: only hist_len entries are valid."""
    pos, vel = _history(seed=1)
    O, Hh, _ = pos.shape
    n = 8
    p_ref = ref.intent_prob(cfg, [p[:n] for p in pos], [v[:n] for v in vel])
    p = np.asarray(pred.intent_probabilities(
        cfg, jnp.asarray(pos), jnp.asarray(vel), jnp.full(O, n)))
    np.testing.assert_allclose(p, p_ref, atol=2e-4)


@pytest.mark.parametrize("speed", [0.05, 0.6, 1.3])
def test_rollouts_match_reference(cfg, speed):
    """Mean/size trajectories for all four intents match the loop oracle.

    speed=0.05 < stop_vel exercises the all-intents-stop branch."""
    pos0 = np.array([1.0, -2.0, 1.7])
    heading = 0.7
    vel0 = np.array([np.cos(heading), np.sin(heading), 0.0]) * speed
    size0 = np.array([1.3, 1.3, 1.1])  # bbox + robot size

    ref_pos, ref_size = ref.predict_obstacle(cfg, pos0, vel0, size0)
    pos, size = pred.predict_single(
        cfg, jnp.asarray(pos0), jnp.asarray(vel0),
        jnp.zeros(3), jnp.asarray(size0), empty_grid())
    np.testing.assert_allclose(np.asarray(pos), ref_pos, atol=2e-4)
    np.testing.assert_allclose(np.asarray(size), ref_size, atol=2e-3)


def test_full_predict_shapes(cfg):
    pos, vel = _history(seed=2, O=4, Hh=12)
    O = 4
    sizes = np.tile(np.array([1.3, 1.3, 1.1]), (O, 12, 1))
    out = pred.predict(cfg, jnp.asarray(pos), jnp.asarray(vel),
                       jnp.zeros_like(jnp.asarray(vel)), jnp.asarray(sizes),
                       jnp.full(O, 12), empty_grid())
    assert out.pos.shape == (O, 4, cfg.num_pred + 1, 3)
    assert out.size.shape == (O, 4, cfg.num_pred + 1, 3)
    assert out.intent_prob.shape == (O, 4)

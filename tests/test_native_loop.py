"""Native C++ closed-loop runtime (native/closed_loop.cpp): component
parity against the Python implementations and an end-to-end trial."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.oracle import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_native_world_matches_jax():
    """Seeded world generation + trefoil kinematics agree with
    models/world (both transcribe dynus_obstacles_node.cpp; the JAX side
    is f32, so compare at f32 tolerance)."""
    from intent_mpc_tpu.models.world import generate_scenario, obstacle_state
    from intent_mpc_tpu.utils.config import WorldConfig
    for seed in (0, 7, 123):
        sc = generate_scenario(seed, WorldConfig(num_obstacles=40))
        for t in (0.0, 3.7):
            p, _ = obstacle_state(sc, jnp.asarray(t))
            np_p, np_b, np_s = native.native_world_probe(seed, 40, 0.65, t)
            np.testing.assert_allclose(np.asarray(p), np_p, atol=2e-4)
            np.testing.assert_allclose(np.asarray(sc.bbox), np_b)
            np.testing.assert_array_equal(np.asarray(sc.is_static), np_s)


def test_native_intent_probs_match_predictor():
    from intent_mpc_tpu.models.predictor import intent_probabilities
    from intent_mpc_tpu.utils.config import PredictorConfig
    P = PredictorConfig()
    rng = np.random.default_rng(1)
    for _ in range(4):
        L = 18
        heading = rng.uniform(-np.pi, np.pi)
        speed = rng.uniform(0.5, 3.0)
        pos = np.array([0.0, 0.0, 1.0])
        seq_p, seq_v = [], []
        for _k in range(L):
            heading += rng.normal(0, 0.1)
            vel = np.array([speed * np.cos(heading),
                            speed * np.sin(heading), 0.0])
            pos = pos + vel / 30.0
            seq_p.append(pos.copy())
            seq_v.append(vel)
        ph = np.stack(seq_p[::-1])
        vh = np.stack(seq_v[::-1])
        got = native.native_intent_probe(ph, vh)
        want = np.asarray(intent_probabilities(
            P, jnp.asarray(ph, jnp.float32)[None],
            jnp.asarray(vh, jnp.float32)[None], jnp.asarray([L])))[0]
        np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.slow
def test_native_episode_flies():
    """A small native trial runs the full pipeline: every replan solves,
    the drone makes corridor progress collision-free, and the monitor
    counters are consistent."""
    d = native.run_native_episode(seed=0, num_obstacles=8, timeout=10.0,
                                  max_obstacles=8, nthreads=4)
    assert d["solve_attempts"] > 0
    assert d["solve_successes"] == d["solve_attempts"]
    assert not d["collision"]
    assert d["path_length"] > 30.0          # ~5 m/s corridor progress
    assert d["min_obstacle_distance"] > 0.0
    assert d["samples"] == pytest.approx(1000, abs=20)
    # converged-oracle semantics: commanded-limit violations occur, like
    # the pure-callback oracle loop (RESULTS.md oracle-in-the-loop)
    assert d["vel_violations"] > 0

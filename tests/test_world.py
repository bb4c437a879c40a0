"""World model tests: RNG bit-exactness, scenario generation, trefoil kinematics."""

import numpy as np
import jax.numpy as jnp

from intent_mpc_tpu.utils.rng import MT19937
from intent_mpc_tpu.utils.config import WorldConfig
from intent_mpc_tpu.models.world import (
    Scenario, generate_scenario, obstacle_state, straight_line_ref_traj)


def test_mt19937_standard_vector():
    """std::mt19937 default-seeded: the 10000th output is 4123659995
    (C++ standard, [rand.predef])."""
    rng = MT19937(5489)
    out = 0
    for _ in range(10000):
        out = rng.next_u32()
    assert out == 4123659995


def test_uniform_real_range_and_determinism():
    a = MT19937(42)
    b = MT19937(42)
    va = [a.uniform(0, 1) for _ in range(100)]
    vb = [b.uniform(0, 1) for _ in range(100)]
    assert va == vb
    assert all(0.0 <= v < 1.0 for v in va)
    # libstdc++ two-word generate_canonical: first draw = low word
    c = MT19937(7)
    w0, w1 = c.next_u32(), c.next_u32()
    d = MT19937(7)
    assert d.uniform() == (w0 + w1 * 2.0**32) / 2.0**64


def test_scenario_generation_counts():
    cfg = WorldConfig(num_obstacles=40, dynamic_ratio=0.65)
    sc = generate_scenario(seed=3, cfg=cfg)
    n_dyn = int(40 * 0.65)
    assert int((~np.asarray(sc.is_static)).sum()) == n_dyn
    stat = np.asarray(sc.is_static)
    bbox = np.asarray(sc.bbox)
    # static split: 35% pillars (0.4,0.4,4.0) then walls (0.4,4.0,0.4)
    n_static = 40 - n_dyn
    n_vert = sum(1 for i in range(n_static) if i < n_static * 0.35)
    pillars = np.isclose(bbox[stat], np.array([0.4, 0.4, 4.0])).all(-1).sum()
    assert pillars == n_vert
    # same seed -> identical world; different seed -> different
    sc2 = generate_scenario(seed=3, cfg=cfg)
    np.testing.assert_array_equal(np.asarray(sc.origin), np.asarray(sc2.origin))
    sc3 = generate_scenario(seed=4, cfg=cfg)
    assert not np.allclose(np.asarray(sc.origin), np.asarray(sc3.origin))


def test_trefoil_velocity_is_position_derivative():
    cfg = WorldConfig(num_obstacles=10)
    sc = generate_scenario(seed=0, cfg=cfg)
    t = 3.7
    eps = 1e-3
    p0, v = obstacle_state(sc, jnp.asarray(t))
    pm, _ = obstacle_state(sc, jnp.asarray(t - eps))
    pp, _ = obstacle_state(sc, jnp.asarray(t + eps))
    fd = (np.asarray(pp) - np.asarray(pm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(v), fd, atol=5e-3)
    # statics hold position
    stat = np.asarray(sc.is_static)
    np.testing.assert_array_equal(np.asarray(p0)[stat], np.asarray(sc.origin)[stat])


def test_straight_line_ref_traj():
    pts = np.asarray(straight_line_ref_traj((0, 0, 2), (105, 0, 2), 2.5))
    assert pts.shape == (43, 3)   # matches ref_trajectory_dynus_benchmark.txt
    np.testing.assert_allclose(pts[0], [0, 0, 2], atol=1e-6)
    np.testing.assert_allclose(pts[-1], [105, 0, 2], atol=1e-4)
    np.testing.assert_allclose(np.diff(pts[:, 0]), 2.5, atol=1e-4)

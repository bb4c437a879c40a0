"""Exploration (DEP-equivalent) tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.models import exploration as ex


def _half_observed_map(n=24):
    """Left half free (negative log odds), right half unknown (0)."""
    lo = np.zeros((n, n, 8), np.float32)
    lo[: n // 2] = -1.0
    return jnp.asarray(lo)


def test_classify_and_frontiers():
    cfg = ex.ExplorationConfig()
    lo = _half_observed_map()
    unknown, free, occ = ex.classify(lo, cfg)
    assert bool(unknown[20, 5, 4]) and bool(free[3, 5, 4])
    fr = np.asarray(ex.frontiers(lo, cfg))
    # frontier at the boundary column, nowhere deep inside free space
    assert fr[11, :, :].any()
    assert not fr[2, :, :].any()


def test_information_gain_prefers_boundary():
    cfg = ex.ExplorationConfig(sensor_range=2.0)
    lo = _half_observed_map()
    res = 0.5
    vps = jnp.asarray([[2.0, 6.0, 2.0],     # deep in free space
                       [5.5, 6.0, 2.0]])    # near the unknown boundary
    g = np.asarray(ex.information_gain(lo, jnp.zeros(3), res, vps, cfg))
    assert g[1] > g[0]


def test_plan_next_view_targets_frontier():
    cfg = ex.ExplorationConfig(sensor_range=2.0, num_candidates=256)
    lo = _half_observed_map()
    res = 0.5
    plan = ex.plan_next_view(lo, (0, 0, 0), res,
                             jnp.array([1.0, 6.0, 2.0]),
                             (0.5, 0.5, 0.5), (11.5, 11.5, 3.5),
                             jax.random.key(0), cfg)
    # the chosen view must be in the observed-free half, near the boundary
    v = np.asarray(plan.viewpoint)
    assert v[0] < 6.0                       # inside free half
    assert v[0] > 3.0                       # pulled toward the frontier
    assert float(plan.gain) > 0

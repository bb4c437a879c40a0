"""Benchmark analysis tests: combine, collision recheck."""

import os

import numpy as np
import jax.numpy as jnp

from intent_mpc_tpu.benchmark import analyze, harness
from intent_mpc_tpu.models.world import generate_scenario
from intent_mpc_tpu.utils.config import WorldConfig


def test_combine_runs(tmp_path):
    rows = [{"trial_id": 0, "seed": 1, "goal_reached": True,
             "path_length": 10.0}]
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    harness.save_csv(rows, str(d1 / "trials.csv"))
    harness.save_csv(rows, str(d2 / "trials.csv"))
    merged = analyze.combine_runs([str(d1), str(d2)])
    assert len(merged) == 2
    assert [r["trial_id"] for r in merged] == [0, 1]
    assert merged[0]["goal_reached"] is True
    assert merged[1]["path_length"] == 10.0


def test_recheck_collisions_detects_pass_through():
    cfg = WorldConfig(num_obstacles=4, dynamic_ratio=0.0)
    sc = generate_scenario(seed=0, cfg=cfg)
    # a path straight through the first static obstacle
    target = np.asarray(sc.origin[0])
    path = np.stack([target + np.array([-5.0, 0, 0]),
                     target,
                     target + np.array([5.0, 0, 0])])
    hit, dmin = analyze.recheck_collisions(sc, path, cycle_dt=0.1)
    assert hit and dmin == 0.0
    # a path far away is clean
    far = path + np.array([0.0, 200.0, 0.0])
    hit2, dmin2 = analyze.recheck_collisions(sc, far, cycle_dt=0.1)
    assert not hit2 and dmin2 > 100.0

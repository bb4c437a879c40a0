"""YAML config loading + episode visualization tests."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.utils import yaml_config
from intent_mpc_tpu.utils.config import IntentMPCConfig


def test_from_dict_overrides_and_defaults():
    cfg = yaml_config.from_dict({
        "planner": {"horizon": 20, "y_range": [-3, 3]},
        "solver": {"max_iter": 42},
        "world": {"num_obstacles": 50},
        "goal": [50, 0, 2],
    })
    assert cfg.planner.horizon == 20
    assert cfg.planner.y_range == (-3, 3)
    assert cfg.planner.solver.max_iter == 42
    assert cfg.world.num_obstacles == 50
    assert cfg.goal == (50, 0, 2)
    # untouched defaults preserved (reference yaml values)
    assert cfg.planner.dynamic_safety_dist == 1.5
    assert cfg.predictor.num_pred == 30


def test_from_dict_rejects_unknown_keys():
    with pytest.raises(KeyError):
        yaml_config.from_dict({"planner": {"horizzon": 30}})
    with pytest.raises(KeyError):
        yaml_config.from_dict({"plannner": {}})


def test_load_yaml_roundtrip(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("planner:\n  horizon: 12\nengine:\n  timeout: 7.5\n")
    cfg = yaml_config.load_yaml(str(p))
    assert cfg.planner.horizon == 12
    assert cfg.engine.timeout == 7.5


def test_plot_episode_writes_png(tmp_path):
    from intent_mpc_tpu.benchmark import viz
    from intent_mpc_tpu.models.world import generate_scenario
    from intent_mpc_tpu.utils.config import small_config
    cfg = small_config(num_obstacles=8)
    sc = generate_scenario(0, cfg.world)
    path = np.stack([np.linspace(0, 8, 30), np.zeros(30),
                     np.full(30, 2.0)], -1)
    out = str(tmp_path / "ep.png")
    viz.plot_episode(cfg, sc, path, out, title="test")
    assert os.path.exists(out) and os.path.getsize(out) > 10000

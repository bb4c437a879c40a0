"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.utils.config import small_config
from intent_mpc_tpu.models.world import straight_line_ref_traj
from intent_mpc_tpu.parallel import sharding as sh


@pytest.fixture(scope="module")
def setup():
    cfg = small_config(num_obstacles=4, horizon=8, timeout=1.0,
                       max_obstacles=4, hist=8)
    cfg = cfg.replace(goal=(6.0, 0.0, 2.0))
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=0.5)
    return cfg, ref


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_unsharded(setup):
    cfg, ref = setup
    seeds = range(8)
    scenarios = sh.stack_scenarios(cfg, seeds)
    tl = jnp.asarray(ref.shape[0])

    m_plain, agg_plain = sh.batch_rollout(cfg, scenarios, ref, tl, mesh=None,
                                          solver_iters=20, num_cycles=4)
    mesh = sh.make_mesh(8)
    m_shard, agg_shard = sh.batch_rollout(cfg, scenarios, ref, tl, mesh=mesh,
                                          solver_iters=20, num_cycles=4)
    np.testing.assert_allclose(np.asarray(m_plain.path_length),
                               np.asarray(m_shard.path_length), atol=1e-4)
    assert agg_plain["episodes"] == agg_shard["episodes"] == 8
    np.testing.assert_allclose(agg_plain["path_length_sum"],
                               agg_shard["path_length_sum"], rtol=1e-4)
    np.testing.assert_allclose(agg_plain["min_dist_min"],
                               agg_shard["min_dist_min"], rtol=1e-4)


def test_psum_reduction_collects_fleet_stats(setup):
    cfg, ref = setup
    mesh = sh.make_mesh(4)
    scenarios = sh.stack_scenarios(cfg, range(8))   # 2 per device
    tl = jnp.asarray(ref.shape[0])
    _, agg = sh.batch_rollout(cfg, scenarios, ref, tl, mesh=mesh,
                              solver_iters=10, num_cycles=2)
    assert agg["episodes"] == 8
    summary = sh.aggregate_summary(agg)
    assert 0.0 <= summary["success_rate"] <= 1.0
    assert summary["num_episodes"] == 8


def test_global_scenario_feed_matches_host_stack(setup):
    """stack_scenarios_global (the multi-host per-process feed) must equal
    stack_scenarios + shard_scenarios in the single-process case, and feed
    batch_rollout identically."""
    cfg, ref = setup
    mesh = sh.make_mesh(8)
    assert sh.init_distributed() == 0    # single-process no-op
    g = sh.stack_scenarios_global(cfg, list(range(8)), mesh)
    h = sh.shard_scenarios(sh.stack_scenarios(cfg, range(8)), mesh)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(h)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    tl = jnp.asarray(ref.shape[0])
    _, agg = sh.batch_rollout(cfg, g, ref, tl, mesh=mesh,
                              solver_iters=10, num_cycles=2)
    assert agg["episodes"] == 8

    # batch not divisible across the 8 mesh shards -> loud error
    with pytest.raises(ValueError):
        sh.stack_scenarios_global(cfg, list(range(7)), mesh)


def test_production_program_inventory():
    """Pin the PRODUCTION program class's collective inventory (VERDICT r4
    item 4): horizon 30, 64 obstacle slots, 200-obstacle DYNUS world,
    default solver (75-iteration budget, factor reuse) compiled over the
    8-device mesh — the only collectives are the two scalar statistic
    all-reduces (32 bytes). The goal-mode and real-detector production
    variants get the same check in __graft_entry__.dryrun_multichip,
    which the driver executes every round."""
    from intent_mpc_tpu.utils.config import IntentMPCConfig

    cfg = IntentMPCConfig()
    assert cfg.planner.horizon == 30 and cfg.planner.max_obstacles == 64
    ref = straight_line_ref_traj(cfg.start, cfg.goal, spacing=2.5)
    mesh = sh.make_mesh(8)
    scen = sh.stack_scenarios(cfg, range(8))
    rep = sh.collective_report(cfg, scen, ref, jnp.asarray(ref.shape[0]),
                               mesh, num_cycles=2)
    assert rep["counts"] == {"all-reduce": 2}, rep
    assert rep["total_bytes"] == 32, rep


def test_fleet_program_is_communication_free(setup):
    """Compiler-verified scaling claim: the optimized HLO of the sharded
    fleet program contains ONLY the per-episode statistic reductions — a
    few scalar all-reduces, tens of bytes — and no all-gather /
    all-to-all / collective-permute / reduce-scatter. Any scenario-sized
    collective here is a sharding leak that would turn multi-chip
    scaling into a bandwidth problem (RESULTS.md weak-scaling section)."""
    cfg, ref = setup
    mesh = sh.make_mesh(8)
    scen = sh.stack_scenarios(cfg, range(8))
    rep = sh.collective_report(cfg, scen, ref, jnp.asarray(ref.shape[0]),
                               mesh, solver_iters=10, num_cycles=2)
    assert set(rep["counts"]) <= {"all-reduce"}, rep
    assert rep["total_bytes"] <= 100, rep   # scalar statistics only
    assert all(b <= 64 for _, b in rep["ops"]), rep

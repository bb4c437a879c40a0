"""Checkpoint/resume: a resumed fleet continues bit-exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intent_mpc_tpu.utils.config import small_config
from intent_mpc_tpu.models.world import generate_scenario, straight_line_ref_traj
from intent_mpc_tpu.engine import closed_loop as cl
from intent_mpc_tpu.engine import checkpoint as ckpt
from intent_mpc_tpu.models.occupancy import empty_grid


def _run_cycles(cfg, scen, ref, carry, start, n):
    tl = jnp.asarray(ref.shape[0])
    occ = empty_grid()
    for i in range(start, start + n):
        carry, _ = jax.vmap(
            lambda c, s: cl.episode_step(cfg, s, ref, tl, occ, c,
                                         jnp.asarray(i, jnp.int32),
                                         solver_iters=30))(carry, scen)
    return carry


def test_checkpoint_resume_bit_exact(tmp_path):
    cfg = small_config(num_obstacles=6, horizon=10, timeout=3.0,
                       max_obstacles=6, hist=12)
    cfg = cfg.replace(goal=(8.0, 0.0, 2.0))
    seeds = [3, 4]
    scens = [generate_scenario(s, cfg.world) for s in seeds]
    scen = jax.tree.map(lambda *a: jnp.stack(a), *scens)
    ref = straight_line_ref_traj(cfg.start, cfg.goal, 0.5)
    carry0 = jax.vmap(lambda s: cl.init_carry(cfg, s))(scen)

    # uninterrupted: 8 cycles
    full = _run_cycles(cfg, scen, ref, carry0, 0, 8)

    # interrupted at 4, checkpointed, resumed
    half = _run_cycles(cfg, scen, ref, carry0, 0, 4)
    path = str(tmp_path / "fleet.npz")
    ckpt.save_checkpoint(path, half, 4, seeds)
    carry_r, cyc, seeds_r, scen_r = ckpt.load_checkpoint(path, cfg)
    assert cyc == 4 and list(seeds_r) == seeds
    for a, b in zip(jax.tree.leaves(scen_r), jax.tree.leaves(scen)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    resumed = _run_cycles(cfg, scen_r, ref, carry_r, cyc, 4)

    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_rejects_mismatched_config(tmp_path):
    cfg = small_config(num_obstacles=6, horizon=10, timeout=3.0,
                       max_obstacles=6, hist=12)
    seeds = [0]
    scens = [generate_scenario(0, cfg.world)]
    scen = jax.tree.map(lambda *a: jnp.stack(a), *scens)
    carry = jax.vmap(lambda s: cl.init_carry(cfg, s))(scen)
    path = str(tmp_path / "c.npz")
    ckpt.save_checkpoint(path, carry, 0, seeds)
    cfg2 = small_config(num_obstacles=6, horizon=12, timeout=3.0,
                        max_obstacles=6, hist=12)
    with pytest.raises(ValueError):
        ckpt.load_checkpoint(path, cfg2)


def _rows_equal(a_rows, b_rows, rtol=1e-5):
    """Row equality with exact ints/bools and ulp-tolerant floats.

    run_trials (sharded batch_rollout) and run_trials_checkpointed (chunked
    scan) are *different compiled programs*: XLA may fuse the pure-XLA
    structured factorization differently in each, so float statistics can
    differ in the last bits across programs. Bit-exactness is guaranteed
    only for resume within the checkpointed program
    (test_checkpoint_resume_bit_exact)."""
    assert len(a_rows) == len(b_rows)
    for ra, rb in zip(a_rows, b_rows):
        assert ra.keys() == rb.keys()
        for k in ra:
            if isinstance(ra[k], float):
                np.testing.assert_allclose(ra[k], rb[k], rtol=rtol,
                                           err_msg=f"field {k}")
            else:
                assert ra[k] == rb[k], f"field {k}: {ra[k]} != {rb[k]}"


def test_harness_checkpointed_matches_plain(tmp_path):
    """run_trials_checkpointed == run_trials rows (exact ints/bools,
    ulp-tolerant floats), and a half-run checkpoint resumes to the
    bit-identical result of the uninterrupted checkpointed run."""
    from intent_mpc_tpu.benchmark import harness as H
    cfg = small_config(num_obstacles=6, horizon=10, timeout=1.5,
                       max_obstacles=6, hist=12)
    cfg = cfg.replace(goal=(8.0, 0.0, 2.0))
    seeds = [1, 2]
    plain = H.run_trials(cfg, seeds, solver_iters=30)
    p1 = str(tmp_path / "a.npz")
    ck = H.run_trials_checkpointed(cfg, seeds, p1, chunk_cycles=6,
                                   solver_iters=30)
    _rows_equal(ck, plain)

    # simulate preemption: run only the first chunk by timeout-limited cfg,
    # then resume with the full timeout against the same checkpoint file.
    # Same program as `ck` -> bit-exact row equality.
    import dataclasses
    p2 = str(tmp_path / "b.npz")
    cfg_short = cfg.replace(engine=dataclasses.replace(cfg.engine,
                                                       timeout=0.6))
    H.run_trials_checkpointed(cfg_short, seeds, p2, chunk_cycles=6,
                              solver_iters=30)
    resumed = H.run_trials_checkpointed(cfg, seeds, p2, chunk_cycles=6,
                                        solver_iters=30)
    assert resumed == ck

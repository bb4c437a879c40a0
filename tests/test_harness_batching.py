"""Harness batch padding + chunked dispatch (VERDICT r3 items 5/6a).

The TPU batch-throughput curve has XLA tiling cliffs (36/48/64/96/112
measure 2-3x below 40/56/80/128), and a single dispatched engine scan
must stay under the tunnel worker's crash envelope on EVERY path —
including sharded (mesh) fleets. These tests pin: the padding size map,
that padded runs return exactly the unpadded rows (episodes are
batch-independent), and that the chunked multi-dispatch path — plain and
shard_map-sharded — reproduces the single-dispatch metrics bit-exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intent_mpc_tpu.benchmark import harness as H
from intent_mpc_tpu.parallel import sharding as sh
from intent_mpc_tpu.utils.config import small_config


def test_padded_batch_size_map():
    # pass-through: small and certified-good sizes
    for n in (1, 2, 8, 16, 32, 40, 56, 80, 128):
        assert H.padded_batch_size(n) == n
    # measured cliffs round up to the next good tiling
    assert H.padded_batch_size(36) == 40
    assert H.padded_batch_size(48) == 56
    assert H.padded_batch_size(64) == 80
    assert H.padded_batch_size(96) == 128
    assert H.padded_batch_size(112) == 128
    # beyond the curve: multiples of the measured peak
    assert H.padded_batch_size(129) == 256
    assert H.padded_batch_size(200) == 256
    assert H.padded_batch_size(256) == 256


def _tiny():
    return small_config(num_obstacles=4, horizon=6, timeout=1.0,
                        max_obstacles=4, hist=8)


@pytest.mark.slow
def test_padded_rows_equal_unpadded():
    """Padding rows are dropped and do not perturb the requested trials
    (vmap batches are independent episodes)."""
    cfg = _tiny()
    rows2 = H.run_trials(cfg, [0, 1], pad_batch=False)
    rows4 = H.run_trials(cfg, [0, 1, 2, 3], pad_batch=False)
    for a, b in zip(rows2, rows4[:2]):
        for k in a:
            assert a[k] == b[k], (k, a[k], b[k])


@pytest.mark.slow
def test_chunked_dispatch_matches_plain():
    """Multi-dispatch splitting (in-memory carry) matches the one-scan
    run, with and without a device mesh. Discrete outcomes (goal,
    collision, counters) must be identical; float metrics are compared at
    f32-fusion tolerance (the differently-shaped programs — scan length
    3 vs 20, shard_map vs vmap — fuse differently and round differently
    in the last ulps)."""
    cfg = _tiny()
    seeds = list(range(8))
    plain = H.run_trials(cfg, seeds, pad_batch=False)
    chunked = H.run_trials(cfg, seeds, pad_batch=False, chunk_cycles=3)
    mesh = sh.make_mesh()
    chunked_mesh = H.run_trials(cfg, seeds, mesh=mesh, pad_batch=False,
                                chunk_cycles=3)

    def close(a, b, tag, k):
        if isinstance(a, bool) or isinstance(a, int):
            assert a == b, (tag, k, a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                       err_msg=f"{tag}:{k}")

    for a, b, c in zip(plain, chunked, chunked_mesh):
        for k in a:
            close(a[k], b[k], "chunk", k)
            close(a[k], c[k], "mesh", k)

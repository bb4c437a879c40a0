"""Persistent XLA compilation cache.

This machine's TPU compile times vary 30-560 s for the same program
(RESULTS.md); a disk cache makes every second session start in seconds.
Call enable_compilation_cache() before the first jit dispatch — bench.py,
the benchmark harness, and tests/conftest.py all do.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                           ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (default:
    <repo>/.jax_cache). Caches every compile regardless of size/time so
    even the small single-cycle programs hit."""
    path = os.path.abspath(path or os.environ.get("INTENT_MPC_JAX_CACHE",
                                                  DEFAULT_DIR))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path

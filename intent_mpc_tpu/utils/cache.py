"""Persistent XLA compilation cache.

This machine's TPU compile times vary 30-560 s for the same program
(RESULTS.md); a disk cache makes every second session start in seconds.
Call enable_compilation_cache() before the first jit dispatch — bench.py,
the benchmark harness, and tests/conftest.py all do.
"""

from __future__ import annotations

import hashlib
import os

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                           ".jax_cache")


def _host_tag() -> str:
    """Cache-key tag identifying this host's CPU microarchitecture.

    JAX's CPU cache key does not cover the LLVM target features the AOT
    result was compiled with; loading an entry produced on a different
    machine logs 'could lead to execution errors such as SIGILL' and can
    change vectorization (and therefore last-bit rounding). Partition the
    cache per CPU-flag set so entries never cross machines."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = ""
            ident = []
            for line in f:
                if line.startswith("flags") and not flags:
                    flags = " ".join(sorted(line.split()[2:]))
                # the flag set alone is NOT enough: LLVM derives tuning
                # features (prefer-no-scatter/-gather) from the CPU
                # MODEL, so two hosts with identical flags can produce
                # incompatible AOT results (observed: a cache entry from
                # a sibling machine segfaulted this host inside
                # get_executable_and_time). Partition by model identity
                # too.
                if line.startswith(("model name", "vendor_id", "model\t",
                                    "cpu family")) and len(ident) < 4:
                    ident.append(line.strip())
            if flags:
                return hashlib.sha256(
                    ("|".join(ident) + "||" + flags).encode()
                ).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (default:
    <repo>/.jax_cache/<host-cpu-tag>). Caches every compile regardless of
    size/time so even the small single-cycle programs hit."""
    path = os.path.abspath(path or os.environ.get("INTENT_MPC_JAX_CACHE",
                                                  DEFAULT_DIR))
    path = os.path.join(path, _host_tag())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path

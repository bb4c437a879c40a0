"""Test config: force a virtual 8-device CPU mesh so sharding tests run
without TPU hardware, and keep everything deterministic.

Note: this environment's axon TPU plugin force-sets jax_platforms="axon,cpu"
at import time (env var JAX_PLATFORMS is ignored), so we must override via
jax.config.update() after importing jax but before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from intent_mpc_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a fake 8-device CPU mesh
(``xla_force_host_platform_device_count``), the standard JAX substitute for
multi-chip hardware. The environment pins ``JAX_PLATFORMS=axon`` (the real
TPU tunnel) via sitecustomize, so we must override through
``jax.config.update`` — env vars alone are not honored — and XLA flags must
be set before the CPU backend initializes (it is lazy, so doing both here is
safe as long as no test imports jax before conftest runs).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: tiny-model jits dominate test wall time;
# caching them across runs cuts the suite from tens of minutes to ~1.
jax.config.update("jax_compilation_cache_dir", "/tmp/dbsr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

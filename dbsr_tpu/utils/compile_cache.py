"""Persistent XLA compilation cache for all production entry points.

Every fresh process pays jit compile (or remote compile-cache
retrieval over the relay: ~1-3 min for the train step) for executables
that were already compiled by the previous chunk/eval/serving process.
JAX's persistent cache serializes compiled executables to disk keyed by
HLO + compile options + jaxlib version; a probe on the axon TPU backend
measured an 18 s compile collapsing to 1.2 s in the next process. A
chunked 100-epoch campaign (20 training processes + evals) saves
~20-40 min of startup wall-clock.

Env control: ``DBSR_TPU_COMPILE_CACHE=<dir>`` overrides the location,
``DBSR_TPU_COMPILE_CACHE=0`` disables. Entries are tens of MB each;
the directory is safe to delete at any time.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".dbsr_tpu", "xla_cache")


def enable_persistent_cache(directory: str | None = None) -> str | None:
    """Idempotent; call before first device use. Returns the cache dir
    in effect, or None when disabled."""
    env = os.environ.get("DBSR_TPU_COMPILE_CACHE")
    if env == "0":
        return None
    directory = env or directory or _DEFAULT
    os.makedirs(directory, exist_ok=True)

    import jax
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # log WHY a compile missed the cache (key diffs) — misses cost
    # minutes over the relay, so they should be visible in stage logs
    jax.config.update("jax_explain_cache_misses", True)
    return directory

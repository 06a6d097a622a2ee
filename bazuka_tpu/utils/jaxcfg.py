"""JAX runtime configuration helpers.

Compiling big-integer kernels produces large HLO graphs; the persistent
compilation cache makes every kernel compile once per machine instead of
once per process — essential for test turnaround and for production
cold-start.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compile_cache(path: str = "/root/.cache/bazuka_tpu_xla"):
    global _DONE
    if _DONE:
        return
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _DONE = True


def force_cpu():
    """Route everything to the CPU backend (tests / dev).  Must run before
    any backend initializes; env-var edits are too late because this
    environment pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon."""
    import jax

    jax.config.update("jax_platforms", "cpu")

"""JAX runtime configuration helpers.

Compiling big-integer kernels produces large HLO graphs; the persistent
compilation cache makes every kernel compile once per machine instead of
once per process — essential for test turnaround and for production
cold-start.
"""

from __future__ import annotations

import os

_DONE = False


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags AND the XLA context.
    XLA:CPU caches AOT machine code specialized to the compiling host;
    executing an entry compiled on a host with different vector
    extensions SIGILLs/segfaults (observed across fleet machines).
    The XLA context matters too: processes that initialize the CPU
    client alongside a TPU plugin compile with extra LLVM tunings
    (+prefer-no-scatter/+prefer-no-gather) that are recorded as
    "machine features", so their entries fail to load under plain
    JAX_PLATFORMS=cpu on the SAME host — each load failure logs a
    full feature-mismatch spam line and forces a recompile (the round-2
    MULTICHIP timeout).  Keying by (cpu flags, XLA_FLAGS, platform
    env) gives every context its own always-loadable entries."""
    import hashlib

    ctx = os.environ.get("XLA_FLAGS", "") + "|" + os.environ.get(
        "JAX_PLATFORMS", ""
    )
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1((flags + "|" + ctx).encode()).hexdigest()[:12]


def enable_compile_cache(path: str = "/root/.cache/bazuka_tpu_xla",
                         tag: str | None = None):
    """`tag` isolates a workload in its own cache subdir.  Used by the
    multi-chip dryrun: the shared fingerprint dir accumulated AOT entries
    merged from a foreign host in round 2 (loading them spams
    feature-mismatch errors and forces recompiles); a tagged dir only
    ever contains entries this host compiled."""
    global _DONE
    if _DONE:
        return
    import jax

    # TPU executables (device code behind the PJRT tunnel) are host-
    # portable and expensive — share them at the root.  CPU executables
    # are host-specialized AOT machine code — key them by CPU flags.
    if jax.default_backend() != "tpu":
        path = os.path.join(path, _host_fingerprint())
    if tag:
        path = os.path.join(path, tag)
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

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
    """Short hash of the host CPU's feature flags.  XLA:CPU caches AOT
    machine code specialized to the compiling host; executing an entry
    compiled on a host with different vector extensions SIGILLs/segfaults
    (observed across fleet machines).  Keying the cache dir by the flag
    set makes entries portable-safe while still shared per machine type.

    Known cosmetic quirk (XLA 0.9, measured round 3): a subset of CPU
    entries record LLVM tuning pseudo-features (+prefer-no-scatter/
    +prefer-no-gather) as machine features and then NEVER reload — two
    ERROR log lines + a recompile per program, in EVERY context,
    including the one that compiled them.  Splitting the cache by XLA
    context was tried and does not help (the tunings are recorded
    regardless); it only fragments the cache and multiplies cold
    compiles, so the key stays cpuinfo-only."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "generic"


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

"""Test harness config: force the CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware, and enable
the persistent XLA compile cache (limb kernels are compile-heavy).

NOTE: this environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon (a remote TPU tunnel that serializes across
processes).  Env-var edits are too late — jax's config already read the
environment — so we override through jax.config BEFORE any backend
initializes.  Benchmarks (bench.py) intentionally keep the axon TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazuka_tpu.utils.jaxcfg import enable_compile_cache, force_cpu  # noqa: E402

force_cpu()
enable_compile_cache()

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

import pytest  # noqa: E402

# ---------------------------------------------------------------- tiers
#
# Two tiers (README "Running the tests"):
#   default     — correctness suite, budget < 10 min COLD on a 4-core
#                 host (measured round 5; the XLA:CPU persistent cache
#                 never hits on this stack — its AOT loader records
#                 tuning pseudo-features as machine features and rejects
#                 its own entries — so every run pays full compiles).
#                 Includes one ungated real Groth16 prove/verify
#                 roundtrip against the COMMITTED toy proving key
#                 (tests/data/, regenerated+checked in the slow tier).
#   slow tier   — compile/execution-heavy device-kernel tests (big MSM /
#                 sharded-collective / E2E-pipeline programs: XLA:CPU
#                 executes limb curve math ~4000x slower than the TPU).
#                 Opt in with BAZUKA_SLOW_TESTS=1 or `-m slow`.


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile/execution-heavy kernel test; opt in with "
        "BAZUKA_SLOW_TESTS=1 or -m slow",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("BAZUKA_SLOW_TESTS"):
        return
    if "slow" in (config.option.markexpr or ""):
        return  # explicit -m selection: let pytest's own filter decide
    skip = pytest.mark.skip(
        reason="slow tier: set BAZUKA_SLOW_TESTS=1 or pass -m slow"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

"""bazuka_tpu — a TPU-native zero-knowledge proving framework.

Covers the capability surface of the Ziesha `bazuka` node (reference at
/root/reference): BLS12-381 field/curve arithmetic, Poseidon hashing, the
sparse quad-Merkle contract-state machine, Groth16 proving/verification for
the MPN zk-rollup, and the blockchain/node/wallet stack around it — designed
for TPU (JAX/XLA/Pallas, SPMD over device meshes) rather than ported.
"""

import os


def _setup_jax_cache():
    """Persistent XLA compile cache: compiles here are expensive (single-host
    CPU fallback) and kernels are reused across processes."""
    try:
        import jax

        cache_dir = os.environ.get(
            "BAZUKA_TPU_JAX_CACHE",
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_jax_cache()

__version__ = "0.1.0"

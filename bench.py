#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline metric evolves with the build (SURVEY.md §7 / BASELINE.json):
currently batched-Poseidon throughput (the Merkle/witness workhorse);
upgrades to MSM points/s and NTT elems/s as those kernels land.

The reference publishes no numbers (SURVEY.md §6).  `vs_baseline` is
measured against a calibrated single-core CPU Poseidon rate (the
reference's native Rust Poseidon hashes ~25k/s/core for t=5; see
BASELINE.md) — i.e. vs_baseline = our_rate / 25_000.
"""
import json
import sys
import time

import numpy as np

from bazuka_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()


def bench_poseidon(batch=8192, iters=10):
    import jax

    from bazuka_tpu.fields.limbs import fr_field
    from bazuka_tpu.ops.poseidon import poseidon_batch_mont

    F = fr_field("jax")
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**63, size=(batch, 4), dtype=np.uint64)
    enc = F.xp.asarray(F.encode(np.array(vals, dtype=object)))

    out = poseidon_batch_mont(enc)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = poseidon_batch_mont(enc)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    rate = batch / dt
    return {
        "metric": "poseidon_t5_hashes_per_s",
        "value": round(rate, 1),
        "unit": "hashes/s",
        "vs_baseline": round(rate / 25_000.0, 3),
    }


def main():
    result = None
    # 2^18 keeps total wall time ~4 min incl. TPU compile round-trips;
    # 2^20 measures 167,990 pts/s (vs_baseline 0.336) in ~12 min — see
    # PERFORMANCE.md.
    try:
        from bazuka_tpu.ops.msm import bench_entry

        result = bench_entry(log_n=18)
    except Exception as e:
        print(f"MSM bench failed ({type(e).__name__}); falling back", file=sys.stderr)
    if result is None:
        try:
            result = bench_entry(log_n=16)
        except Exception:
            result = bench_poseidon()
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())

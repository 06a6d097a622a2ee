#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: G1 MSM points/s at 2^20 with full 255-bit scalars on the v2
fused limb-major Pippenger pipeline (ops.pallas_msm) — the dominant
Groth16 proving kernel (BASELINE.md config 4).  The `extra` field
carries the 2^18 MSM rate and the 2^20 NTT rate so all BASELINE sizes
are visible in one line.  vs_baseline is measured against the working
CPU baseline of bellman-Pippenger ~= 0.5M points/s on a 32-core host
(BASELINE.md: the reference publishes no numbers of its own).

Falls back to smaller MSM sizes, then batched Poseidon, if the primary
path fails (e.g. no TPU).
"""
import json
import os
import signal
import sys
import time

import numpy as np

# The axon TPU tunnel can wedge on a stale claim (observed after
# watchdog-killed device programs): backend init then blocks forever.
# Give it 10 minutes, then re-exec ourselves on the CPU backend so the
# driver always gets its JSON line.
if not os.environ.get("BAZUKA_BENCH_CPU"):
    def _tpu_wedged(signum, frame):
        os.environ["BAZUKA_BENCH_CPU"] = "1"
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.execv(sys.executable, [sys.executable] + sys.argv)

    signal.signal(signal.SIGALRM, _tpu_wedged)
    signal.alarm(600)

from bazuka_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()
import jax

jax.devices()  # force backend init under the alarm
signal.alarm(0)

BASELINE_MSM = 500_000.0  # points/s, bellman on a 32-core CPU (estimate)


def bench_msm(log_n: int, c: int = 12, iters: int = 3):
    """Warm points/s of the full MSM (device program + host combine)."""
    import jax

    from bazuka_tpu.crypto import bls12_381 as bls
    from bazuka_tpu.ops import pallas_msm as pm
    from bazuka_tpu.ops import weierstrass as wst
    from bazuka_tpu.ops.msm import _enc_scalars

    wst.warmup("jax")
    n = 1 << log_n
    rng = np.random.default_rng(0)
    base_pts = [bls.g1_mul(bls.G1_GEN, int(k)) for k in range(1, 65)]
    pts = [base_pts[i % 64] for i in range(n)]
    scalars = [
        (int(a) << 192 | int(b) << 128 | int(c2) << 64 | int(d)) % bls.R
        for a, b, c2, d in rng.integers(0, 2**63, size=(n, 4))
    ]
    P_am, inf = pm.points_to_am(pts)
    s = _enc_scalars(scalars, "jax")
    pm.msm_lm(P_am, inf, s, c=c)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pm.msm_lm(P_am, inf, s, c=c)
    dt = (time.perf_counter() - t0) / iters
    assert out is not None
    return n / dt


def bench_ntt(log_n: int, iters: int = 10):
    """Warm elements/s of the single-chip radix-2 NTT (BASELINE config 3)."""
    import jax

    from bazuka_tpu.fields.limbs import fr_field
    from bazuka_tpu.ops.ntt import ntt_mont

    F = fr_field("jax")
    n = 1 << log_n
    rng = np.random.default_rng(1)
    limbs = rng.integers(0, 2**16, size=(n, 16), dtype=np.uint32)
    x = F.xp.asarray(limbs)
    out = ntt_mont(x)  # compile
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ntt_mont(out)  # chain the dependency: forces execution
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return n / dt


def bench_poseidon(batch=8192, iters=10):
    import jax

    from bazuka_tpu.fields.limbs import fr_field
    from bazuka_tpu.ops.poseidon import poseidon_batch_mont

    F = fr_field("jax")
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**63, size=(batch, 4), dtype=np.uint64)
    enc = F.xp.asarray(F.encode(np.array(vals, dtype=object)))
    out = poseidon_batch_mont(enc)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = poseidon_batch_mont(enc)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {
        "metric": "poseidon_t5_hashes_per_s",
        "value": round(batch / dt, 1),
        "unit": "hashes/s",
        "vs_baseline": round(batch / dt / 25_000.0, 3),
    }


def main():
    on_tpu = jax.default_backend() == "tpu"
    extra = {}
    try:
        extra["ntt_elems_per_s_2e20"] = round(bench_ntt(20 if on_tpu else 14), 1)
    except Exception as e:
        print(f"NTT bench failed: {type(e).__name__}: {e}", file=sys.stderr)
    result = None
    # CPU fallback (TPU tunnel down): only a small MSM is feasible
    for log_n in (20, 18, 16) if on_tpu else (12,):
        try:
            rate = bench_msm(log_n)
            if result is None:
                result = {
                    "metric": f"msm_g1_points_per_s_2e{log_n}",
                    "value": round(rate, 1),
                    "unit": "points/s",
                    "vs_baseline": round(rate / BASELINE_MSM, 3),
                }
            else:
                extra[f"msm_g1_points_per_s_2e{log_n}"] = round(rate, 1)
                break  # headline + one secondary size is enough
        except Exception as e:
            print(f"MSM 2^{log_n} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    if result is None:
        result = bench_poseidon()
    if extra:
        result["extra"] = extra
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())

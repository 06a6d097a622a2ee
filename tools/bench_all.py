#!/usr/bin/env python
"""Full kernel benchmark sweep — one JSON line per metric.

Covers the BASELINE.json configs: Poseidon hashing, Montgomery-mul
throughput (jnp vs Pallas), NTT sizes 2^16..2^22, MSM sizes 2^16..2^20,
and (on a multi-device mesh) sharded-MSM scaling efficiency.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def out(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": round(value, 2), "unit": unit, **extra}), flush=True)


def bench_poseidon(jax, np):
    from bazuka_tpu.fields.limbs import fr_field
    from bazuka_tpu.ops.poseidon import poseidon_batch_mont

    F = fr_field("jax")
    rng = np.random.default_rng(0)
    B = 1 << 16
    enc = F.xp.asarray(F.encode(np.array(
        rng.integers(0, 2**63, size=(B, 4)), dtype=object)))
    o = poseidon_batch_mont(enc); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(5):
        o = poseidon_batch_mont(enc)
    jax.block_until_ready(o)
    out("poseidon_t5_hashes_per_s", B / ((time.perf_counter() - t0) / 5), "hashes/s")


def bench_mont_mul(jax, np):
    from bazuka_tpu.fields.limbs import fp_field
    from bazuka_tpu.ops.pallas_field import pallas_mont_mul

    F = fp_field("jax")
    rng = np.random.default_rng(0)
    B = 1 << 20
    a = F.encode(np.array([int(x) for x in rng.integers(0, 2**62, size=B)], dtype=object))
    if jax.default_backend() == "tpu":
        f = jax.jit(lambda a: pallas_mont_mul(F, a, a))
    else:
        f = jax.jit(lambda a: F.redc(F.mul_wide(a, a)))
    o = f(a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(5):
        o = f(a)
    jax.block_until_ready(o)
    out("fp_mont_mul_per_s", B / ((time.perf_counter() - t0) / 5), "muls/s")


def bench_ntt(jax, np, log_n):
    from bazuka_tpu.fields.limbs import fr_field
    from bazuka_tpu.ops.ntt import ntt_mont

    F = fr_field("jax")
    rng = np.random.default_rng(0)
    n = 1 << log_n
    enc = F.xp.asarray(F.encode(np.array(
        [int(x) for x in rng.integers(0, 2**63, size=n)], dtype=object)))
    # chain the transforms: ntt_mont DONATES its input on TPU, so the
    # warmed output feeds the next call instead of reusing `enc`
    o = ntt_mont(enc); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(3):
        o = ntt_mont(o)
    jax.block_until_ready(o)
    out(f"ntt_elems_per_s_2e{log_n}", n / ((time.perf_counter() - t0) / 3), "elems/s")


def bench_msm(jax, np, log_n):
    from bazuka_tpu.ops.msm import bench_entry

    r = bench_entry(log_n=log_n, iters=2)
    print(json.dumps(r), flush=True)


def bench_scaling(jax, np):
    """Sharded-MSM scaling efficiency across the available devices."""
    from bazuka_tpu.crypto import bls12_381 as bls
    from bazuka_tpu.parallel import make_mesh, msm_sharded_host

    n_dev = len(jax.devices())
    if n_dev < 2:
        return
    rng = np.random.default_rng(0)
    n = 1 << 12
    pts = [bls.g1_mul(bls.G1_GEN, int(k) + 1) for k in range(64)] * (n // 64)
    scalars = [int(x) for x in rng.integers(0, 2**62, size=n)]
    times = {}
    for d in (1, n_dev):
        mesh = make_mesh(d)
        msm_sharded_host(mesh, pts, scalars, c=4, nbits=64)  # compile
        t0 = time.perf_counter()
        msm_sharded_host(mesh, pts, scalars, c=4, nbits=64)
        times[d] = time.perf_counter() - t0
    eff = times[1] / (times[n_dev] * n_dev)
    out("msm_scaling_efficiency", eff, f"x{n_dev}dev", t1=round(times[1], 2),
        tn=round(times[n_dev], 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--skip", default="", help="comma list: poseidon,mul,ntt,msm,scaling")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from bazuka_tpu.utils.jaxcfg import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    skip = set(args.skip.split(","))
    out("backend", 0, jax.default_backend())
    if "poseidon" not in skip:
        bench_poseidon(jax, np)
    if "mul" not in skip:
        bench_mont_mul(jax, np)
    if "ntt" not in skip:
        for log_n in (16, 18, 20, 22):
            bench_ntt(jax, np, log_n)
    if "msm" not in skip:
        for log_n in (16, 18, 20):
            bench_msm(jax, np, log_n)
    if "scaling" not in skip:
        bench_scaling(jax, np)


if __name__ == "__main__":
    main()

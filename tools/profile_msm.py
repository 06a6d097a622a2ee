#!/usr/bin/env python
"""Component-level MSM profile on the live backend (TPU).

Answers, for the 2^20 headline MSM (c=12): where do the ~2.9s go?
  - digits+argsort+counts (per chunk)
  - the drain's per-round gather (point table row gather at chunk size)
  - the drain's per-round madd (fused G1 mixed-add over Lp lanes)
  - actual drain round count (max bucket occupancy) vs mean
Then times end-to-end msm_lm at several (c, chunk) points to rank
parameter moves against kernel moves.

Usage: python tools/profile_msm.py [--quick]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bazuka_tpu.utils.jaxcfg import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bazuka_tpu.crypto import bls12_381 as bls  # noqa: E402
from bazuka_tpu.ops import pallas_msm as pm  # noqa: E402
from bazuka_tpu.ops import weierstrass as wst  # noqa: E402
from bazuka_tpu.ops.msm import _enc_scalars  # noqa: E402


def timeit(fn, iters=5, warmup=1):
    out = None
    for _ in range(warmup):
        out = fn()
    if out is not None:
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def build_inputs(log_n):
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
    return P_am, inf, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    wst.warmup("jax")
    log_n = 20
    P_am, inf, s = build_inputs(log_n)
    N = 1 << log_n
    print(f"backend={jax.default_backend()} n=2^{log_n}")

    # ---- component: digits/argsort/counts at chunk sizes
    c = 12
    n_windows = (255 + c - 1) // c
    for lg_ch in (16, 18, 20):
        CH = 1 << lg_ch
        s_t = s[:CH]

        @jax.jit
        def prep(s_t):
            outs = []
            for w in range(n_windows):
                bit0 = w * c
                limb_i = bit0 // 16
                shift = bit0 % 16
                v = s_t[:, limb_i] >> shift
                rem = 16 - shift
                if rem < c and limb_i + 1 < s_t.shape[1]:
                    v = v | (s_t[:, limb_i + 1] << rem)
                outs.append((v & ((1 << c) - 1)).astype(jnp.int32))
            digits = jnp.stack(outs)
            order = jnp.argsort(digits, axis=1)
            counts = jax.vmap(
                lambda d: jnp.bincount(d, length=1 << c)
            )(digits).astype(jnp.int32)
            return order, counts

        dt = timeit(lambda: prep(s_t), iters=3)
        print(f"prep (digits+argsort+counts) chunk=2^{lg_ch}: {dt*1e3:.1f} ms"
              f"  ({(N//CH)*dt*1e3:.1f} ms over all chunks)")

    # ---- component: per-round gather at table sizes
    Lp = pm._pad_lanes(n_windows * (1 << c), 8)
    rng = np.random.default_rng(1)
    for lg_ch in (16, 18, 20):
        CH = 1 << lg_ch
        P_t = P_am[:CH]
        idx_rand = jnp.asarray(rng.integers(0, CH, size=Lp, dtype=np.int32))
        idx_mono = jnp.sort(idx_rand)

        @jax.jit
        def gath(P_t, idx):
            return P_t[idx].transpose(1, 2, 0)

        dt_r = timeit(lambda: gath(P_t, idx_rand), iters=10)
        dt_m = timeit(lambda: gath(P_t, idx_mono), iters=10)
        print(f"gather {Lp} rows from 2^{lg_ch} table: random {dt_r*1e3:.2f} ms"
              f" / monotone {dt_m*1e3:.2f} ms")

    # ---- component: one madd round over Lp lanes
    acc0 = jnp.zeros((3, 24, Lp), jnp.uint32)
    one = pm.fp_field("jax").R_mod_p % pm.fp_field("jax").p
    onel = np.array([(one >> (16 * i)) & 0xFFFF for i in range(24)],
                    np.uint32)
    acc0 = acc0.at[1].set(jnp.asarray(onel)[:, None])
    pts_fixed = P_am[:Lp].transpose(1, 2, 0)
    mask = jnp.ones(Lp, jnp.uint32)

    @jax.jit
    def one_madd(acc, pts, mask):
        return pm.madd_select_lm(acc, pts, mask, 8)

    dt = timeit(lambda: one_madd(acc0, pts_fixed, mask), iters=10)
    print(f"madd round over {Lp} lanes: {dt*1e3:.2f} ms"
          f"  ({Lp/dt/1e6:.2f} M adds/s)")

    # ---- actual round counts
    for lg_ch in (16, 18, 20):
        CH = 1 << lg_ch
        sc = np.asarray(s[:CH])
        digits = np.zeros((n_windows, CH), np.int64)
        full = np.zeros(CH, dtype=object)
        for i in range(16):
            full = full | (sc[:, i].astype(object) << (16 * i))
        for w in range(n_windows):
            digits[w] = np.array(
                [(int(x) >> (w * c)) & ((1 << c) - 1) for x in full]
            )
        mx = 0
        for w in range(n_windows):
            cnt = np.bincount(digits[w], minlength=1 << c)
            cnt[0] = 0
            mx = max(mx, int(cnt.max()))
        mean = CH / (1 << c)
        print(f"chunk=2^{lg_ch}: max occupancy {mx}, mean {mean:.0f},"
              f" ratio {mx/mean:.2f}; rounds over all chunks"
              f" {(N//CH)*mx}")

    if args.quick:
        return

    # ---- the jitted device program alone vs the full host wrapper
    for cc, lg_ch in ((12, 18), (12, 19), (12, 20), (13, 19), (13, 20),
                      (14, 20), (15, 20), (16, 20)):
        try:
            run, n_w = pm._msm_program(N, cc, 255, 8, False, 1 << lg_ch)
            dt_dev = timeit(lambda: run(P_am, inf, s), iters=3, warmup=1)
            dt_all = timeit(
                lambda: pm.msm_lm(P_am, inf, s, c=cc, chunk=1 << lg_ch),
                iters=3, warmup=1,
            )
            print(f"c={cc} chunk=2^{lg_ch}: device {dt_dev:.3f}s"
                  f" | full {dt_all:.3f}s ({N/dt_all/1e3:.1f}k pts/s)",
                  flush=True)
        except Exception as e:
            print(f"c={cc} chunk=2^{lg_ch}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Second-stage MSM profile: true drain round counts (device logic
replicated) and in-loop per-round cost (fixed-R while_loop with the
exact acc_body), to locate the 3.2s at 2^20/c=12/chunk=2^18."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bazuka_tpu.utils.jaxcfg import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bazuka_tpu.ops import pallas_msm as pm  # noqa: E402
from bazuka_tpu.ops import weierstrass as wst  # noqa: E402
from tools.profile_msm import build_inputs, timeit  # noqa: E402


def main():
    wst.warmup("jax")
    log_n, c, s_tile = 20, 12, 8
    CH = 1 << 18
    P_am, inf, s = build_inputs(log_n)
    N = 1 << log_n
    nbits = 255
    n_windows = (nbits + c - 1) // c
    n_buckets = 1 << c
    L = n_windows * n_buckets
    Lp = pm._pad_lanes(L, s_tile)
    spreads, _ranges = pm._spread_plan(c, nbits)
    _n_fold, _fm, _perm, _pv, weight0 = pm._fold_consts(c, nbits, s_tile)
    skewed = [w for w in range(n_windows) if spreads[w] > 1]
    print(f"windows={n_windows} Lp={Lp} spreads={spreads}")

    # ---- true max_count per chunk (device logic, replicated in numpy)
    s_np = np.asarray(s)
    total_rounds = 0
    for t in range(N // CH):
        sc = s_np[t * CH:(t + 1) * CH]
        digits = np.zeros((n_windows, CH), np.int64)
        for w in range(n_windows):
            bit0 = w * c
            li, sh = bit0 // 16, bit0 % 16
            v = sc[:, li].astype(np.int64) >> sh
            rem = 16 - sh
            if rem < c and li + 1 < 16:
                v = v | (sc[:, li + 1].astype(np.int64) << rem)
            digits[w] = v & (n_buckets - 1)
        counts = np.stack(
            [np.bincount(digits[w], minlength=n_buckets)
             for w in range(n_windows)]
        )
        for w in skewed:
            S = spreads[w]
            # after the rank-spread, sub-bucket occupancy of digit d is
            # ceil/floor(count/S)
            d_counts = counts[w]
            sub = np.zeros(n_buckets, np.int64)
            for d in np.flatnonzero(d_counts):
                q, r = divmod(int(d_counts[d]), S)
                base = d * S
                sub[base:base + S] = q
                sub[base:base + r] += 1
            counts[w] = sub
        w0 = np.asarray(weight0).reshape(n_windows, n_buckets)
        counts = np.where(w0, 0, counts)
        mx = int(counts.max())
        total_rounds += mx
        print(f"chunk {t}: max_count={mx} mean={CH/n_buckets:.0f} "
              f"argmax w={np.unravel_index(counts.argmax(), counts.shape)}")
    print(f"total drain rounds: {total_rounds}")

    # ---- fixed-R replica of the in-loop body
    P_t = P_am[:CH]
    inf_t = inf[:CH]
    order = jnp.asarray(
        np.random.default_rng(0).permutation(CH)[None, :].repeat(
            n_windows, 0
        )
    )
    offsets_f = jnp.asarray(
        np.random.default_rng(1).integers(0, CH - 4096, size=Lp,
                                          dtype=np.int32))
    counts_f = jnp.full((Lp,), 10**9, jnp.int32)
    win_of_lane = jnp.clip(
        jnp.arange(Lp, dtype=jnp.int32) // n_buckets, 0, n_windows - 1
    )
    one = pm.fp_field("jax").R_mod_p % pm.fp_field("jax").p
    onel = np.array([(one >> (16 * i)) & 0xFFFF for i in range(24)],
                    np.uint32)

    def make_loop(R):
        def run(P_t, inf_t, order, offsets_f, counts_f):
            acc = jnp.zeros((3, 24, Lp), jnp.uint32)
            acc = acc.at[1].set(jnp.asarray(onel)[:, None])

            def acc_body(state):
                r, acc = state
                slot = jnp.clip(offsets_f + r, 0, CH - 1)
                src = order[win_of_lane, slot]
                pts = P_t[src].transpose(1, 2, 0)
                valid = (r < counts_f) & (inf_t[src] == 0)
                return r + 1, pm.madd_select_lm(acc, pts, valid, s_tile)

            _, acc = jax.lax.while_loop(
                lambda st: st[0] < R, acc_body, (jnp.int32(0), acc)
            )
            return acc

        return jax.jit(run)

    for R in (32, 128, 512):
        fn = make_loop(R)
        dt = timeit(lambda: fn(P_t, inf_t, order, offsets_f, counts_f),
                    iters=3, warmup=1)
        print(f"while_loop R={R}: {dt*1e3:.1f} ms "
              f"({dt/R*1e3:.3f} ms/round)", flush=True)


if __name__ == "__main__":
    main()

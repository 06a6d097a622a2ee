#!/usr/bin/env python
"""Third-stage MSM profile: isolate the in-loop bottleneck.

  1. while_loop with STATIC-slice point reads (no gather): per-round floor
  2. while_loop with MONOTONE in-loop gather (sorted indices)
  3. one BIG standalone gather (the sort-materialization cost)
  4. while_loop body cost without the point read at all (madd only)
"""
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
    CH = 1 << 18
    Lp = 90112
    R = 128
    P_am, inf, s = build_inputs(18)
    P_t = P_am[:CH]
    inf_t = inf[:CH]
    rng = np.random.default_rng(0)
    one = pm.fp_field("jax").R_mod_p % pm.fp_field("jax").p
    onel = np.array([(one >> (16 * i)) & 0xFFFF for i in range(24)],
                    np.uint32)

    def acc0():
        a = jnp.zeros((3, 24, Lp), jnp.uint32)
        return a.at[1].set(jnp.asarray(onel)[:, None])

    mask = jnp.ones(Lp, jnp.uint32)

    # 1. static strided reads: stream laid out (T, Lp-rows) so round r
    #    reads a contiguous (Lp, 2, 24) slab
    stream = jnp.asarray(
        rng.integers(0, 2**16, size=(R, Lp, 2, 24), dtype=np.uint32)
    )  # placeholder coords; cost model only

    @jax.jit
    def loop_static(stream):
        def body(st):
            r, acc = st
            pts = jax.lax.dynamic_slice(
                stream, (r, 0, 0, 0), (1, Lp, 2, 24)
            )[0].transpose(1, 2, 0)
            return r + 1, pm.madd_select_lm(acc, pts, mask, 8)

        _, acc = jax.lax.while_loop(lambda st: st[0] < R, body,
                                    (jnp.int32(0), acc0()))
        return acc

    dt = timeit(lambda: loop_static(stream), iters=3)
    print(f"static-slice loop: {dt/R*1e3:.3f} ms/round", flush=True)

    # 2. monotone in-loop gather: per-round indices sorted
    offs = jnp.asarray(np.sort(rng.integers(0, CH - R, size=Lp,
                                            dtype=np.int32)))

    @jax.jit
    def loop_mono(P_t, offs):
        def body(st):
            r, acc = st
            src = offs + r
            pts = P_t[src].transpose(1, 2, 0)
            valid = inf_t[src] == 0
            return r + 1, pm.madd_select_lm(acc, pts, valid, 8)

        _, acc = jax.lax.while_loop(lambda st: st[0] < R, body,
                                    (jnp.int32(0), acc0()))
        return acc

    dt = timeit(lambda: loop_mono(P_t, offs), iters=3)
    print(f"monotone-gather loop: {dt/R*1e3:.3f} ms/round", flush=True)

    # 3. big standalone gather (sort materialization): W*CH rows
    for W in (4, 22):
        idx = jnp.asarray(
            rng.permutation(np.tile(np.arange(CH, dtype=np.int32), W))
        )

        @jax.jit
        def big_gather(P_t, idx):
            return P_t[idx]

        dt = timeit(lambda: big_gather(P_t, idx), iters=3)
        rows = W * CH
        print(f"big gather {rows/1e6:.1f}M rows from 2^18 table: "
              f"{dt*1e3:.1f} ms ({dt/rows*1e9:.1f} ns/row, "
              f"{rows*192/dt/1e9:.1f} GB/s)", flush=True)

    # 4. madd-only loop (no point read): VPU floor
    pts_fixed = P_t[:Lp].transpose(1, 2, 0)

    @jax.jit
    def loop_madd(pts_fixed):
        def body(st):
            r, acc = st
            return r + 1, pm.madd_select_lm(acc, pts_fixed, mask, 8)

        _, acc = jax.lax.while_loop(lambda st: st[0] < R, body,
                                    (jnp.int32(0), acc0()))
        return acc

    dt = timeit(lambda: loop_madd(pts_fixed), iters=3)
    print(f"madd-only loop: {dt/R*1e3:.3f} ms/round", flush=True)

    # 5. random in-loop gather (reference, should be ~4.4ms/round)
    offs_r = jnp.asarray(rng.integers(0, CH - R, size=Lp, dtype=np.int32))
    dt = timeit(lambda: loop_mono(P_t, offs_r), iters=3)
    print(f"random-gather loop (ref): {dt/R*1e3:.3f} ms/round", flush=True)


if __name__ == "__main__":
    main()

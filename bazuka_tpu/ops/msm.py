"""Pippenger multi-scalar multiplication on TPU (G1 and G2).

The dominant Groth16 proving kernel (4x G1 + 1x G2 MSM per proof;
SURVEY.md §2.2, §6: MSM is 60-80% of prove time on accelerators).

TPU-first formulation — no branchy bucket chains:
  * window size c ∈ {4, 8, 16} so every window is LIMB-ALIGNED in the
    16-bit scalar limbs (window extraction = shift/mask of one limb).
  * per window: sort point indices by bucket id (XLA sort), then a
    `while_loop` of bucket-parallel masked complete-adds — every round
    gathers one point per bucket lane and adds with the RCB15 branchless
    formula, so the VPU sees dense (2^c, n_limb) batches.  Round count =
    max bucket occupancy (data-dependent while_loop, static shapes —
    skewed scalar distributions degrade smoothly, never overflow).
  * bucket reduction Σ j·B_j via a Hillis–Steele suffix scan (c steps)
    plus a binary tree reduction (c steps) — all lane-parallel.
  * windows combined sequentially with c doublings each.

Zero scalars land in bucket 0, which has weight 0 in Σ j·B_j — the
(huge) zero-coefficient fraction of QAP witnesses costs only its adds
in lane 0.

Multi-chip: shard points/scalars over the mesh data axis; each chip
produces a partial MSM which is reduced with the same complete add
(see bazuka_tpu.parallel).

Oracle: `bazuka_tpu.crypto.bls12_381` host curve.  jax backend only
(np twin not provided — the oracle covers ground truth).
"""

from __future__ import annotations

import functools

import numpy as np

from . import weierstrass as wst


def _choose_c(n: int) -> int:
    if n >= 1 << 17:
        return 16
    if n >= 1 << 9:
        return 8
    return 4


def _window_bits(scalars, w: int, c: int):
    """Bucket index of window w: limb-aligned shift/mask of the (N, 16)
    standard-form 16-bit scalar limbs."""
    per_limb = 16 // c
    limb = scalars[..., w // per_limb]
    shift = (w % per_limb) * c
    return ((limb >> shift) & ((1 << c) - 1)).astype(np.int32)


# ---- coordinate helpers (Fp coords are arrays; Fp2 coords are pairs) ----


def _cmap(fn, coord):
    if isinstance(coord, tuple):
        return tuple(fn(x) for x in coord)
    return fn(coord)


def _pmap(fn, P):
    return tuple(_cmap(fn, coord) for coord in P)


def _gather(P, idx):
    return _pmap(lambda x: x[idx], P)


def _lane_count(P) -> int:
    c0 = P[0]
    return (c0[0] if isinstance(c0, tuple) else c0).shape[0]


def _msm_fn(K, b3, n: int, c: int, nbits: int = 255):
    import jax
    import jax.numpy as jnp

    n_buckets = 1 << c
    n_windows = (nbits + c - 1) // c

    def suffix_scan(P):
        """P[j] <- sum_{k>=j} P[j] via a fori_loop of doubling shifts —
        ONE traced add body for all log2(n_buckets) steps (an unrolled
        scan would inline c copies of the 40s-to-compile add)."""

        def body(i, Pcur):
            shift = jnp.left_shift(jnp.int32(1), i)
            idx = jnp.minimum(jnp.arange(n_buckets) + shift, n_buckets - 1)
            shifted = _gather(Pcur, idx)
            bad = jnp.arange(n_buckets) >= n_buckets - shift
            shifted = wst.proj_select(
                K, bad, wst.proj_identity(K, (n_buckets,)), shifted
            )
            return wst.proj_add(K, Pcur, shifted, b3)

        return jax.lax.fori_loop(0, c, body, P)

    def one_window(P, bidx):
        order = jnp.argsort(bidx)
        counts = jnp.bincount(bidx, length=n_buckets).astype(jnp.int32)
        offsets = jnp.cumsum(counts) - counts
        # bucket 0 has weight 0 in Σ j·B_j — never accumulate it.  This
        # also bounds the loop: a window whose scalar bits are all zero
        # (common in QAP witnesses) would otherwise run N rounds and trip
        # the TPU watchdog.
        counts = counts.at[0].set(0)
        max_count = jnp.max(counts)
        sorted_pts = _gather(P, order)
        acc = wst.proj_identity(K, (n_buckets,))

        def cond(state):
            return state[0] < max_count

        def body(state):
            r, acc = state
            idx = jnp.clip(offsets + r, 0, n - 1)
            valid = r < counts
            pt = _gather(sorted_pts, idx)
            added = wst.proj_add(K, acc, pt, b3)
            return r + 1, wst.proj_select(K, valid, added, acc)

        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))

        # suffix[j] = Σ_{k>=j} acc[k]; then Σ_j j·acc[j] = Σ_{j>=1} suffix[j]
        # = (suffix-scan of suffix)[1] — the SAME loop run twice.
        suffix = suffix_scan(acc)
        lane0 = jnp.arange(n_buckets) == 0
        suffix = wst.proj_select(
            K, lane0, wst.proj_identity(K, (n_buckets,)), suffix
        )
        total = suffix_scan(suffix)
        return _pmap(lambda x: x[1], total)

    def combine(wins):
        """wins: stacked window points (n_windows leading axis), highest
        window first; result = fold of c doublings + add."""

        def body(w, res):
            def dbl(_, r):
                return wst.proj_double(K, r, b3)

            res = jax.lax.fori_loop(0, c, dbl, res)
            wpt = _pmap(lambda x: x[w], wins)
            return wst.proj_add(K, res, wpt, b3)

        return jax.lax.fori_loop(0, n_windows, body, wst.proj_identity(K, ()))

    return one_window, combine


def _msm_fused_fn(K, b3, n: int, c: int, nbits: int = 255):
    """Single-trace MSM (windows unrolled) — used inside shard_map where
    per-window dispatch isn't possible.  Intended for small per-shard
    sizes; the dispatch-per-window path (`msm`) is the primary driver."""
    one_window, combine = _msm_fn(K, b3, n, c, nbits)
    n_windows = (nbits + c - 1) // c
    import jax.numpy as jnp

    def run(P, scalars):
        wins = [
            one_window(P, _window_bits(scalars, w, c))
            for w in range(n_windows - 1, -1, -1)
        ]
        stacked = tuple(
            tuple(jnp.stack([w[ci][sub] for w in wins]) for sub in range(2))
            if isinstance(wins[0][ci], tuple)
            else jnp.stack([w[ci] for w in wins])
            for ci in range(3)
        )
        return combine(stacked)

    return run


@functools.cache
def _msm_compiled(kind: str, backend: str, n: int, c: int, nbits: int = 255):
    """Returns (window_fn, combine_fn), each jitted separately.

    The windows are dispatched from a Python loop rather than fused into
    one graph: the fully-fused scan-over-windows program hit TPU device
    faults at N >= 2^14 even though every individual construct runs
    clean in isolation — per-window dispatch sidesteps the bad fusion
    and compiles one window body total."""
    wst.warmup(backend)
    if kind == "g1":
        K, b3 = wst.fp_ops(backend), wst.g1_b3(backend)
    else:
        K, b3 = wst.fp2_ops(backend), wst.g2_b3(backend)
    window_fn, combine_fn = _msm_fn(K, b3, n, c, nbits)
    if backend == "jax":
        import jax

        window_fn = jax.jit(window_fn)
        combine_fn = jax.jit(combine_fn)
    return window_fn, combine_fn


def msm(P, scalars, kind: str = "g1", backend: str = "jax", c: int | None = None,
        nbits: int = 255):
    """MSM over projective limb points.  P: projective tuple with leading
    axis N; scalars: (N, 16) standard-form Fr limbs.  Returns one
    (unbatched) projective limb point."""
    import jax.numpy as jnp

    n = scalars.shape[0]
    if c is None:
        c = _choose_c(n)
    assert 16 % c == 0, "window must divide the 16-bit limb"
    n_windows = (nbits + c - 1) // c
    window_fn, combine_fn = _msm_compiled(kind, backend, n, c, nbits)
    xp = jnp if backend == "jax" else np
    wins = [
        window_fn(P, _window_bits(scalars, w, c))
        for w in range(n_windows - 1, -1, -1)  # highest window first
    ]
    stacked = tuple(
        tuple(xp.stack([w[ci][sub] for w in wins]) for sub in range(2))
        if isinstance(wins[0][ci], tuple)
        else xp.stack([w[ci] for w in wins])
        for ci in range(3)
    )
    return combine_fn(stacked)


# ---------------------------------------------------------------- host APIs


def _enc_scalars(scalars, backend):
    from ..fields.limbs import fr_field

    Fr = fr_field(backend)
    return Fr.xp.asarray(
        Fr.encode(np.array(list(scalars), dtype=object), mont=False)
    )


def msm_g1_host(points, scalars, backend: str = "jax", c: int | None = None,
                nbits: int = 255):
    """Host affine G1 points + int scalars -> host affine point (or None)."""
    K = wst.fp_ops(backend)
    P = wst.g1_to_proj(K, points)
    R = msm(P, _enc_scalars(scalars, backend), "g1", backend, c, nbits)
    R = tuple(np.asarray(x)[None] for x in R)
    return wst.g1_from_proj(wst.fp_ops("np"), R)[0]


def msm_g2_host(points, scalars, backend: str = "jax", c: int | None = None,
                nbits: int = 255):
    K = wst.fp2_ops(backend)
    P = wst.g2_to_proj(K, points)
    R = msm(P, _enc_scalars(scalars, backend), "g2", backend, c, nbits)
    R = tuple(tuple(np.asarray(x)[None] for x in coord) for coord in R)
    return wst.g2_from_proj(wst.fp2_ops("np"), R)[0]


# ---------------------------------------------------------------- bench


def bench_entry(log_n: int = 18, iters: int = 3, c: int = 16):
    """Driver benchmark: G1 MSM points/s at 2^log_n (BASELINE.json metric).
    Baseline: bellman CPU Pippenger ≈ 0.5M points/s on a 32-core host
    (BASELINE.md: no published numbers; derived estimate)."""
    import time

    import jax

    from ..crypto import bls12_381 as bls

    n = 1 << log_n
    rng = np.random.default_rng(0)
    K = wst.fp_ops("jax")
    # n distinct points: k*G for small k (cheap to build host-side)
    base_pts = [bls.g1_mul(bls.G1_GEN, int(k)) for k in range(1, 65)]
    pts = [base_pts[i % 64] for i in range(n)]
    scalars = [
        (int(a) << 192 | int(b) << 128 | int(c2) << 64 | int(d)) % bls.R
        for a, b, c2, d in rng.integers(0, 2**63, size=(n, 4))
    ]
    P = wst.g1_to_proj(K, pts)
    s = _enc_scalars(scalars, "jax")
    out = msm(P, s, "g1", c=c)  # compile
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = msm(P, s, "g1", c=c)
        jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / iters
    rate = n / dt
    return {
        "metric": f"msm_g1_points_per_s_2e{log_n}",
        "value": round(rate, 1),
        "unit": "points/s",
        "vs_baseline": round(rate / 500_000.0, 3),
    }

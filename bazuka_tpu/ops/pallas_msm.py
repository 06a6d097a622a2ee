"""Fused Pallas kernels + orchestration for the v2 Pippenger MSM.

Round-1 MSM lost ~3x to glue outside the kernel: per-window Python
dispatch, (B, n) <-> (n, S, 128) relayout transposes around every add,
and a separate select pass per accumulation round.  v2 (this module):

  * points live POINT-MAJOR on device: one (N, 3, 24) uint32 array
    whose rows are whole 288-byte points, so per-round bucket gathers
    are contiguous row reads; only the gathered (lanes, 3, 24) batch is
    relaid out limb-major for the kernel
  * ONE jitted program per (N, c) runs every window's bucket
    accumulation together: lanes = n_windows x n_buckets, one
    data-dependent while_loop whose body is gather + one fused
    add-or-keep kernel (the select rides inside the kernel, so a round
    is ONE pallas call instead of add + 3-coord where)
  * the Sigma j*B_j suffix scans run on the same lanes with the same
    kernel (mask = shift validity x lane liveness)
  * only the n_windows window sums leave the device; the final
    c-doublings-per-window combine is host-side bls12_381 (~300 cheap
    host ops, no tiny-batch kernel compile)

Window size c trades rounds (max bucket occupancy ~ N/2^c + tail)
against lanes (n_windows * 2^c); total adds ~= n_windows*N + tails, so
mid-range c (8-12) minimizes work while keeping lanes VPU-sized.

SKEW FIX (the round-count pathology): every window drains for
max(counts) rounds together, but the TOP window's digits span only
ceil(R / 2^(w*c)) values (Fr scalars < R ~ 0.45*2^255), so its buckets
hold ~N/8 points each — 25x the uniform windows — and the whole
program would run N/8 rounds.  Statically-skewed windows are therefore
SPREAD: digit d maps to sub-bucket d*S + (rank mod S) (S = 2^c /
next_pow2(digit_range)), which restores uniform occupancy; after
accumulation, log2(S) masked fold rounds + one static permutation
compact the sub-buckets back to B_d before the suffix scans.  All
spread decisions, fold masks and the permutation are host-static.

Reference anchor: bellman's multiexp (Cargo.toml:21) is the CPU
baseline this replaces; correctness oracle is crypto.bls12_381.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

from ..fields.host import FR_MODULUS
from ..fields.limbs import fp_field, fr_field
from .pallas_curve import LANE, field_emitters

N_LIMB = 24  # Fp limbs


# ------------------------------------------------------------------ kernel


def _emit_mul12(fadd):
    """x -> 12*x mod p via shift-adds (b3 = 3*b = 12 for BLS12-381 G1):
    four modular adds instead of a full Montgomery multiply."""

    def mul12(x):
        x2 = fadd(x, x)
        x4 = fadd(x2, x2)
        x8 = fadd(x4, x4)
        return fadd(x8, x4)

    return mul12


@functools.cache
def _g1_madd_select_call(S: int, s_tile: int, interpret: bool):
    """Fused complete MIXED G1 add with per-lane select:
    out = mask ? P+Q : P, where Q is AFFINE (Z2 = 1).  RCB15 with Z2=1
    drops the Z1*Z2 multiply, and both b3 products become shift-add
    chains: 11 Montgomery muls per add vs 14 for the projective kernel.
    acc limb-major (24, S, 128) x3; Q limb-major (24, S, 128) x2;
    mask (S, 128) uint32.  Q at infinity must be masked out by the
    caller (affine form cannot encode it)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = fp_field("jax")
    n = F.n
    fadd, fsub, fmul = field_emitters(F)
    mul12 = _emit_mul12(fadd)
    one_mont = F.R_mod_p % F.p
    one_limbs = [int((one_mont >> (16 * i)) & 0xFFFF) for i in range(n)]

    def kernel(x1, y1, z1, x2, y2, m, ox, oy, oz):
        import jax.numpy as jnp

        X1 = [x1[i] for i in range(n)]
        Y1 = [y1[i] for i in range(n)]
        Z1 = [z1[i] for i in range(n)]
        X2 = [x2[i] for i in range(n)]
        Y2 = [y2[i] for i in range(n)]
        one = [jnp.full(X1[0].shape, v, jnp.uint32) for v in one_limbs]
        keep = m[0] == 0

        t0 = fmul(X1, X2)
        t1 = fmul(Y1, Y2)
        t2 = Z1  # Z1 * 1
        t3 = fmul(fadd(X1, Y1), fadd(X2, Y2))
        t3 = fsub(t3, fadd(t0, t1))
        t4 = fmul(fadd(Y1, Z1), fadd(Y2, one))
        t4 = fsub(t4, fadd(t1, t2))
        w_ = fmul(fadd(X1, Z1), fadd(X2, one))
        Y3 = fsub(w_, fadd(t0, t2))
        X3 = fadd(fadd(t0, t0), t0)
        t2b = mul12(t2)
        Z3 = fadd(t1, t2b)
        t1m = fsub(t1, t2b)
        Y3b = mul12(Y3)
        X3r = fsub(fmul(t3, t1m), fmul(t4, Y3b))
        Y3r = fadd(fmul(Y3b, X3), fmul(t1m, Z3))
        Z3r = fadd(fmul(Z3, t4), fmul(X3, t3))
        for k in range(n):
            ox[k] = jnp.where(keep, X1[k], X3r[k])
            oy[k] = jnp.where(keep, Y1[k], Y3r[k])
            oz[k] = jnp.where(keep, Z1[k], Z3r[k])

    def call(x1, y1, z1, x2, y2, mask):
        spec = pl.BlockSpec((n, s_tile, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, s_tile, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        shapes = tuple(
            jax.ShapeDtypeStruct((n, S, LANE), np.uint32) for _ in range(3)
        )
        return pl.pallas_call(
            kernel,
            grid=(S // s_tile,),
            out_shape=shapes,
            in_specs=[spec] * 5 + [mspec],
            out_specs=(spec, spec, spec),
            interpret=interpret,
        )(x1, y1, z1, x2, y2, mask)

    return call


def madd_select_lm(acc, pts_aff, mask, s_tile: int = 8,
                   interpret: bool = False):
    """acc: (3, 24, L) projective; pts_aff: (2, 24, L) affine (x, y);
    mask: (L,) — lanes where Q is infinity MUST be masked off.
    Returns (3, 24, L): mask ? acc+Q : acc."""
    import jax.numpy as jnp

    L = acc.shape[-1]
    if not _on_tpu() and not interpret:
        from . import weierstrass as wst

        K = wst.fp_ops("jax")
        b3 = wst.g1_b3("jax")
        F = fp_field("jax")
        one = F.const_mont(1)
        P = tuple(acc[i].T for i in range(3))
        Q = (pts_aff[0].T, pts_aff[1].T,
             jnp.broadcast_to(one[None, :], pts_aff[0].T.shape))
        R = wst.proj_add(K, P, Q, b3)
        R = wst.proj_select(K, mask.astype(bool), R, P)
        return jnp.stack([R[0].T, R[1].T, R[2].T])
    S = L // LANE
    assert S % s_tile == 0, (L, s_tile)
    a = acc.reshape(3, N_LIMB, S, LANE)
    p = pts_aff.reshape(2, N_LIMB, S, LANE)
    m = mask.astype(jnp.uint32).reshape(1, S, LANE)
    ox, oy, oz = _g1_madd_select_call(S, s_tile, interpret)(
        a[0], a[1], a[2], p[0], p[1], m
    )
    return jnp.stack([ox, oy, oz]).reshape(3, N_LIMB, L)


def _emit_fp2(F):
    """Fp2 emitters over the in-kernel Fp emitters: Karatsuba mul and
    the G2 b3 = 12+12i multiply as shift-adds ((a+bi)(12+12i) =
    12(a-b) + 12(a+b)i)."""
    fadd, fsub, fmul = field_emitters(F)
    mul12 = _emit_mul12(fadd)

    def f2add(a, b):
        return (fadd(a[0], b[0]), fadd(a[1], b[1]))

    def f2sub(a, b):
        return (fsub(a[0], b[0]), fsub(a[1], b[1]))

    def f2mul(a, b):
        t0 = fmul(a[0], b[0])
        t1 = fmul(a[1], b[1])
        t2 = fmul(fadd(a[0], a[1]), fadd(b[0], b[1]))
        return (fsub(t0, t1), fsub(fsub(t2, t0), t1))

    def f2mul_b3(a):
        return (mul12(fsub(a[0], a[1])), mul12(fadd(a[0], a[1])))

    return f2add, f2sub, f2mul, f2mul_b3


def _g2_rcb15(f2, X1, Y1, Z1, X2, Y2, Z2):
    """RCB15 complete G2 add body over Fp2 emitter tuples.  Z2=None
    means Q is affine (Z2 = 1), which drops the Z1·Z2 multiply and
    simplifies two cross terms:
      t4 = (Y1+Z1)(Y2+1) − t1 − t2 = Y1 + Z1·Y2
      w  = (X1+Z1)(X2+1) − t0 − t2 = X1 + Z1·X2
    leaving 11 Fp2 muls (33 Fp) + 2 shift-add b3 muls per lane."""
    f2add, f2sub, f2mul, f2mul_b3 = f2
    t0 = f2mul(X1, X2)
    t1 = f2mul(Y1, Y2)
    if Z2 is None:
        t2 = Z1
        t3 = f2mul(f2add(X1, Y1), f2add(X2, Y2))
        t3 = f2sub(t3, f2add(t0, t1))
        t4 = f2add(Y1, f2mul(Z1, Y2))
        w_ = f2add(X1, f2mul(Z1, X2))
    else:
        t2 = f2mul(Z1, Z2)
        t3 = f2mul(f2add(X1, Y1), f2add(X2, Y2))
        t3 = f2sub(t3, f2add(t0, t1))
        t4 = f2mul(f2add(Y1, Z1), f2add(Y2, Z2))
        t4 = f2sub(t4, f2add(t1, t2))
        w_ = f2mul(f2add(X1, Z1), f2add(X2, Z2))
        w_ = f2sub(w_, f2add(t0, t2))
    Y3 = w_
    X3 = f2add(f2add(t0, t0), t0)
    t2b = f2mul_b3(t2)
    Z3 = f2add(t1, t2b)
    t1m = f2sub(t1, t2b)
    Y3b = f2mul_b3(Y3)
    X3r = f2sub(f2mul(t3, t1m), f2mul(t4, Y3b))
    Y3r = f2add(f2mul(Y3b, X3), f2mul(t1m, Z3))
    Z3r = f2add(f2mul(Z3, t4), f2mul(X3, t3))
    return X3r, Y3r, Z3r


@functools.cache
def _g1_add_select_call(S: int, s_tile: int, interpret: bool):
    """Fused complete G1 add with per-lane select:
    out = mask ? P+Q : P.  Inputs/outputs limb-major (24, S, 128);
    mask is (S, 128) uint32 (0/1)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = fp_field("jax")
    n = F.n
    fadd, fsub, fmul = field_emitters(F)
    mul12 = _emit_mul12(fadd)

    def kernel(x1, y1, z1, x2, y2, z2, m, ox, oy, oz):
        import jax.numpy as jnp

        X1 = [x1[i] for i in range(n)]
        Y1 = [y1[i] for i in range(n)]
        Z1 = [z1[i] for i in range(n)]
        X2 = [x2[i] for i in range(n)]
        Y2 = [y2[i] for i in range(n)]
        Z2 = [z2[i] for i in range(n)]
        keep = m[0] == 0

        t0 = fmul(X1, X2)
        t1 = fmul(Y1, Y2)
        t2 = fmul(Z1, Z2)
        t3 = fmul(fadd(X1, Y1), fadd(X2, Y2))
        t3 = fsub(t3, fadd(t0, t1))
        t4 = fmul(fadd(Y1, Z1), fadd(Y2, Z2))
        t4 = fsub(t4, fadd(t1, t2))
        w_ = fmul(fadd(X1, Z1), fadd(X2, Z2))
        Y3 = fsub(w_, fadd(t0, t2))
        X3 = fadd(fadd(t0, t0), t0)
        t2b = mul12(t2)
        Z3 = fadd(t1, t2b)
        t1m = fsub(t1, t2b)
        Y3b = mul12(Y3)
        X3r = fsub(fmul(t3, t1m), fmul(t4, Y3b))
        Y3r = fadd(fmul(Y3b, X3), fmul(t1m, Z3))
        Z3r = fadd(fmul(Z3, t4), fmul(X3, t3))
        for k in range(n):
            ox[k] = jnp.where(keep, X1[k], X3r[k])
            oy[k] = jnp.where(keep, Y1[k], Y3r[k])
            oz[k] = jnp.where(keep, Z1[k], Z3r[k])

    def call(x1, y1, z1, x2, y2, z2, mask):
        spec = pl.BlockSpec((n, s_tile, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, s_tile, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        shapes = tuple(
            jax.ShapeDtypeStruct((n, S, LANE), np.uint32) for _ in range(3)
        )
        return pl.pallas_call(
            kernel,
            grid=(S // s_tile,),
            out_shape=shapes,
            in_specs=[spec] * 6 + [mspec],
            out_specs=(spec, spec, spec),
            interpret=interpret,
        )(x1, y1, z1, x2, y2, z2, mask)

    return call


@functools.cache
def _g2_madd_select_call(S: int, s_tile: int, interpret: bool):
    """Fused complete MIXED G2 add with per-lane select (Fp2 RCB15,
    Z2 = 1).  acc: 6 limb-major (24, S, 128) refs (x0 x1 y0 y1 z0 z1);
    Q: 4 refs (x0 x1 y0 y1); mask (S, 128) uint32."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = fp_field("jax")
    n = F.n
    f2 = _emit_fp2(F)

    def kernel(*refs):
        import jax.numpy as jnp

        ins, q, m, outs = refs[:6], refs[6:10], refs[10], refs[11:]

        def rd(ref):
            return [ref[i] for i in range(n)]

        X1 = (rd(ins[0]), rd(ins[1]))
        Y1 = (rd(ins[2]), rd(ins[3]))
        Z1 = (rd(ins[4]), rd(ins[5]))
        X2 = (rd(q[0]), rd(q[1]))
        Y2 = (rd(q[2]), rd(q[3]))
        keep = m[0] == 0
        X3, Y3, Z3 = _g2_rcb15(f2, X1, Y1, Z1, X2, Y2, None)
        olds = (X1[0], X1[1], Y1[0], Y1[1], Z1[0], Z1[1])
        news = (X3[0], X3[1], Y3[0], Y3[1], Z3[0], Z3[1])
        for ref, old, new in zip(outs, olds, news):
            for k in range(n):
                ref[k] = jnp.where(keep, old[k], new[k])

    def call(*flat):
        spec = pl.BlockSpec((n, s_tile, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, s_tile, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        shapes = tuple(
            jax.ShapeDtypeStruct((n, S, LANE), np.uint32) for _ in range(6)
        )
        return pl.pallas_call(
            kernel,
            grid=(S // s_tile,),
            out_shape=shapes,
            in_specs=[spec] * 10 + [mspec],
            out_specs=(spec,) * 6,
            interpret=interpret,
        )(*flat)

    return call


@functools.cache
def _g2_add_select_call(S: int, s_tile: int, interpret: bool):
    """Fused complete G2 add with per-lane select (both projective)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = fp_field("jax")
    n = F.n
    f2 = _emit_fp2(F)

    def kernel(*refs):
        import jax.numpy as jnp

        ins, q, m, outs = refs[:6], refs[6:12], refs[12], refs[13:]

        def rd(ref):
            return [ref[i] for i in range(n)]

        X1 = (rd(ins[0]), rd(ins[1]))
        Y1 = (rd(ins[2]), rd(ins[3]))
        Z1 = (rd(ins[4]), rd(ins[5]))
        X2 = (rd(q[0]), rd(q[1]))
        Y2 = (rd(q[2]), rd(q[3]))
        Z2 = (rd(q[4]), rd(q[5]))
        keep = m[0] == 0
        X3, Y3, Z3 = _g2_rcb15(f2, X1, Y1, Z1, X2, Y2, Z2)
        olds = (X1[0], X1[1], Y1[0], Y1[1], Z1[0], Z1[1])
        news = (X3[0], X3[1], Y3[0], Y3[1], Z3[0], Z3[1])
        for ref, old, new in zip(outs, olds, news):
            for k in range(n):
                ref[k] = jnp.where(keep, old[k], new[k])

    def call(*flat):
        spec = pl.BlockSpec((n, s_tile, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, s_tile, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        shapes = tuple(
            jax.ShapeDtypeStruct((n, S, LANE), np.uint32) for _ in range(6)
        )
        return pl.pallas_call(
            kernel,
            grid=(S // s_tile,),
            out_shape=shapes,
            in_specs=[spec] * 12 + [mspec],
            out_specs=(spec,) * 6,
            interpret=interpret,
        )(*flat)

    return call


def _g2_lm_to_wst(acc):
    """(6, 24, L) limb-major -> wst proj tuple of Fp2 pairs (L, 24)."""
    return (
        (acc[0].T, acc[1].T),
        (acc[2].T, acc[3].T),
        (acc[4].T, acc[5].T),
    )


def _g2_wst_to_lm(P):
    import jax.numpy as jnp

    return jnp.stack(
        [P[0][0].T, P[0][1].T, P[1][0].T, P[1][1].T, P[2][0].T, P[2][1].T]
    )


def madd_select_g2_lm(acc, pts_aff, mask, s_tile: int = 8,
                      interpret: bool = False):
    """acc: (6, 24, L) limb-major projective G2; pts_aff: (4, 24, L)
    affine; mask: (L,).  Returns mask ? acc+Q : acc."""
    import jax.numpy as jnp

    L = acc.shape[-1]
    if not _on_tpu() and not interpret:
        from . import weierstrass as wst

        K = wst.fp2_ops("jax")
        b3 = wst.g2_b3("jax")
        F = fp_field("jax")
        one = F.const_mont(1)
        P = _g2_lm_to_wst(acc)
        Q = (
            (pts_aff[0].T, pts_aff[1].T),
            (pts_aff[2].T, pts_aff[3].T),
            (jnp.broadcast_to(one[None, :], (L, F.n)),
             jnp.zeros((L, F.n), acc.dtype)),
        )
        R = wst.proj_add(K, P, Q, b3)
        R = wst.proj_select(K, mask.astype(bool), R, P)
        return _g2_wst_to_lm(R)
    S = L // LANE
    assert S % s_tile == 0, (L, s_tile)
    a = acc.reshape(6, N_LIMB, S, LANE)
    p = pts_aff.reshape(4, N_LIMB, S, LANE)
    m = mask.astype(jnp.uint32).reshape(1, S, LANE)
    outs = _g2_madd_select_call(S, s_tile, interpret)(
        *[a[i] for i in range(6)], *[p[i] for i in range(4)], m
    )
    return jnp.stack(outs).reshape(6, N_LIMB, L)


def add_select_g2_lm(acc, pts, mask, s_tile: int = 8,
                     interpret: bool = False):
    """acc, pts: (6, 24, L) limb-major projective G2; mask: (L,)."""
    import jax.numpy as jnp

    L = acc.shape[-1]
    if not _on_tpu() and not interpret:
        from . import weierstrass as wst

        K = wst.fp2_ops("jax")
        b3 = wst.g2_b3("jax")
        P = _g2_lm_to_wst(acc)
        Q = _g2_lm_to_wst(pts)
        R = wst.proj_add(K, P, Q, b3)
        R = wst.proj_select(K, mask.astype(bool), R, P)
        return _g2_wst_to_lm(R)
    S = L // LANE
    assert S % s_tile == 0, (L, s_tile)
    a = acc.reshape(6, N_LIMB, S, LANE)
    p = pts.reshape(6, N_LIMB, S, LANE)
    m = mask.astype(jnp.uint32).reshape(1, S, LANE)
    outs = _g2_add_select_call(S, s_tile, interpret)(
        *[a[i] for i in range(6)], *[p[i] for i in range(6)], m
    )
    return jnp.stack(outs).reshape(6, N_LIMB, L)


# Set True to force the jnp fallback formulas even when the default
# backend is a TPU — required when building programs for a CPU device
# mesh in a process where the TPU plugin is registered (the multi-chip
# dryrun): Mosaic kernels can't lower for CPU devices, and the gate
# below can't see which devices the enclosing jit targets.
FORCE_JNP_FALLBACK = False


def _on_tpu() -> bool:
    if FORCE_JNP_FALLBACK:
        return False
    import jax

    return jax.default_backend() == "tpu"


def add_select_lm(acc, pts, mask, s_tile: int = 8, interpret: bool = False):
    """acc, pts: (3, 24, L) limb-major projective; mask: (L,) bool/int.
    Returns (3, 24, L): mask ? acc+pts : acc.  L must be a multiple of
    s_tile*128.  Fused Pallas kernel on TPU; jnp complete-add fallback
    elsewhere (CPU tests run the identical program structure)."""
    import jax.numpy as jnp

    L = acc.shape[-1]
    if not _on_tpu() and not interpret:
        from . import weierstrass as wst

        K = wst.fp_ops("jax")
        b3 = wst.g1_b3("jax")
        P = tuple(acc[i].T for i in range(3))
        Q = tuple(pts[i].T for i in range(3))
        R = wst.proj_add(K, P, Q, b3)
        R = wst.proj_select(K, mask.astype(bool), R, P)
        return jnp.stack([R[0].T, R[1].T, R[2].T])
    S = L // LANE
    assert S % s_tile == 0, (L, s_tile)
    a = acc.reshape(3, N_LIMB, S, LANE)
    p = pts.reshape(3, N_LIMB, S, LANE)
    m = mask.astype(jnp.uint32).reshape(1, S, LANE)
    ox, oy, oz = _g1_add_select_call(S, s_tile, interpret)(
        a[0], a[1], a[2], p[0], p[1], p[2], m
    )
    return jnp.stack([ox, oy, oz]).reshape(3, N_LIMB, L)


# ------------------------------------------------------------------ msm


def _pad_lanes(L: int, s_tile: int) -> int:
    tile = s_tile * LANE
    return (L + tile - 1) // tile * tile


def msm_pad_len(n: int, chunk: int = 1 << 18) -> int:
    """Canonical padded MSM length for n points: a chunk multiple above
    one chunk, else the next power of two (min 16).  The Groth16 keygen
    pads ALL G1 query arrays of one circuit to the SAME such length so
    the prover's 4 G1 MSMs share ONE compiled device program (pad points
    are infinity with zero scalars — digit-0 lanes are weight-0 and the
    infinity mask guards the gathered adds)."""
    if n >= chunk:
        return (n + chunk - 1) // chunk * chunk
    p = 16
    while p < n:
        p *= 2
    return p


def _next_pow2(v: int) -> int:
    return 1 << max(0, (v - 1).bit_length())


@functools.cache
def _spread_plan(c: int, nbits: int):
    """Static per-window sub-bucket spread factors.  Scalars are < bound
    = min(Fr modulus, 2^nbits); window w sees digits 0..(bound-1)>>(w*c)
    (capped at 2^c - 1).  Skewed windows (digit range < 2^c) get spread
    S_w = 2^c / next_pow2(range) so every sub-bucket's expected
    occupancy matches the uniform windows'."""
    n_windows = (nbits + c - 1) // c
    bound = min(FR_MODULUS, 1 << nbits)
    spreads, ranges = [], []
    for w in range(n_windows):
        top = (bound - 1) >> (w * c)
        rng = min(1 << c, top + 1)
        ranges.append(rng)
        spreads.append((1 << c) // _next_pow2(rng))
    return tuple(spreads), tuple(ranges)


@functools.cache
def _fold_consts(c: int, nbits: int, s_tile: int):
    """Host-static masks for the post-accumulation sub-bucket fold:
    per fold round k, lane l absorbs lane l+2^k iff both are sub-lanes
    of the same (window, digit) block and l is the surviving lane; then
    a static permutation moves B_d from lane d*S_w to lane d (identity
    elsewhere).  Returns (n_fold_rounds, fold_masks (k, Lp) uint32,
    perm (Lp,) int32, perm_valid (Lp,) uint32, weight0 (L,) bool)."""
    spreads, ranges = _spread_plan(c, nbits)
    n_windows = len(spreads)
    n_buckets = 1 << c
    L = n_windows * n_buckets
    Lp = _pad_lanes(L, s_tile)
    max_s = max(spreads)
    n_fold = max_s.bit_length() - 1  # log2(max spread)

    lane = np.arange(Lp, dtype=np.int64)
    win = np.minimum(lane // n_buckets, n_windows - 1)
    b = lane % n_buckets
    S = np.asarray(spreads, dtype=np.int64)[win]
    sub = b % S  # position within the (window, digit) sub-bucket block
    in_range = lane < L

    fold_masks = np.zeros((max(n_fold, 1), Lp), dtype=np.uint32)
    for k in range(n_fold):
        step = 1 << k
        ok = (S > step) & (sub % (2 * step) == 0) & (sub + step < S) & in_range
        fold_masks[k] = ok.astype(np.uint32)

    rng_arr = np.asarray(ranges, dtype=np.int64)[win]
    perm_valid = (b < rng_arr) & in_range
    perm = np.where(perm_valid, win * n_buckets + b * S, lane)
    perm = np.minimum(perm, Lp - 1).astype(np.int32)

    # weight-zero lanes: digit 0 == sub-buckets 0..S-1 of each window
    weight0 = (b < S) & in_range
    return (
        n_fold,
        fold_masks,
        perm,
        perm_valid.astype(np.uint32),
        weight0[:L].astype(bool),
    )


@functools.cache
def _msm_program(N: int, c: int, nbits: int, s_tile: int, interpret: bool,
                 chunk: int = 1 << 18, kind: str = "g1"):
    """Build + jit the whole-MSM device program for size N, window c.
    kind='g2' runs the identical orchestration over Fp2 coordinates
    (6-plane projective / 4-plane affine, fused G2 kernels)."""
    import jax
    import jax.numpy as jnp

    from . import weierstrass as wst

    wst.warmup("jax")  # cached curve constants must materialize untraced
    F = fp_field("jax")
    n_windows = (nbits + c - 1) // c
    n_buckets = 1 << c
    L = n_windows * n_buckets
    Lp = _pad_lanes(L, s_tile)
    n_aff = 2 if kind == "g1" else 4
    n_proj = 3 if kind == "g1" else 6
    one_plane = 1 if kind == "g1" else 2  # y (resp. y0) plane
    madd = madd_select_lm if kind == "g1" else madd_select_g2_lm
    addsel = add_select_lm if kind == "g1" else add_select_g2_lm

    # identity lanes (0, 1, 0) in Montgomery limb-major form
    one_mont = F.R_mod_p % F.p
    one_limbs = np.array(
        [(one_mont >> (16 * i)) & 0xFFFF for i in range(N_LIMB)], np.uint32
    )

    def identity_lanes():
        acc = jnp.zeros((n_proj, N_LIMB, Lp), jnp.uint32)
        return acc.at[one_plane].set(jnp.asarray(one_limbs)[:, None])

    per_limb = 16 // c if c <= 16 else None

    def window_digits(scalars):
        """(N, 16) uint32 Fr limbs -> (n_windows, N) int32 digits."""
        outs = []
        for w in range(n_windows):
            bit0 = w * c
            limb_i = bit0 // 16
            shift = bit0 % 16
            v = scalars[:, limb_i] >> shift
            rem = 16 - shift
            if rem < c and limb_i + 1 < scalars.shape[1]:
                v = v | (scalars[:, limb_i + 1] << rem)
            outs.append((v & ((1 << c) - 1)).astype(jnp.int32))
        return jnp.stack(outs)

    spreads, _ranges = _spread_plan(c, nbits)
    n_fold, fold_masks, perm, perm_valid, weight0 = _fold_consts(
        c, nbits, s_tile
    )
    skewed = [w for w in range(n_windows) if spreads[w] > 1]

    # CACHE-SIZED POINT CHUNKS: an (N, 2, 24) table above a few tens of
    # MB drops the TPU's random row-gather rate ~15x (measured: ~0.3 ms
    # vs ~4.4 ms per 90k-row round at 2^16 vs 2^20 tables).  Bucket sums
    # are additive over point subsets, so the accumulation streams the
    # points in 2^16-point chunks — each chunk sorts/counts its own
    # slice and drains into the SAME lane accumulators — keeping every
    # gather (points, order, offsets) inside the fast-cache regime at
    # any N.  No sorted copies are materialized: memory stays O(chunk).
    CH = min(N, chunk)
    n_chunks = (N + CH - 1) // CH
    N_pad = n_chunks * CH

    def run(P_am, inf, scalars):
        # P_am: (N, 2, 24) point-major AFFINE; inf: (N,) uint32 infinity
        # mask; scalars: (N, 16) std-form Fr limbs
        if N_pad != N:
            # pad rows are infinity with zero scalars: digit-0 lanes are
            # weight-0 and the inf mask guards the gathered adds anyway
            P_am = jnp.pad(P_am, ((0, N_pad - N), (0, 0), (0, 0)))
            inf = jnp.pad(inf, (0, N_pad - N), constant_values=1)
            scalars = jnp.pad(scalars, ((0, N_pad - N), (0, 0)))

        # window of each (padded) lane, for gathering from per-window order
        win_of_lane = jnp.clip(
            jnp.arange(Lp, dtype=jnp.int32) // n_buckets, 0, n_windows - 1
        )
        w0_mask = jnp.asarray(weight0).reshape(n_windows, n_buckets)

        def chunk_body(t, acc):
            P_t = jax.lax.dynamic_slice(
                P_am, (t * CH, 0, 0), (CH, n_aff, 24)
            )
            inf_t = jax.lax.dynamic_slice(inf, (t * CH,), (CH,))
            s_t = jax.lax.dynamic_slice(scalars, (t * CH, 0), (CH, 16))
            digits = window_digits(s_t)  # (W, CH)
            order = jnp.argsort(digits, axis=1)  # per-window point order
            counts = jax.vmap(
                lambda d: jnp.bincount(d, length=n_buckets)
            )(digits).astype(jnp.int32)
            offsets = jnp.cumsum(counts, axis=1) - counts
            if skewed:
                # spread skewed windows' digits over sub-buckets by
                # in-digit rank (see module docstring): rank = sort
                # position - digit offset, via the double-argsort
                # inverse permutation
                d_sk = digits[jnp.asarray(skewed)]
                order_sk = order[jnp.asarray(skewed)]
                sortrank = jnp.argsort(order_sk, axis=1)
                rank = sortrank - jnp.take_along_axis(
                    offsets[jnp.asarray(skewed)], d_sk, axis=1
                )
                S_arr = jnp.asarray([spreads[w] for w in skewed])[:, None]
                d2 = (d_sk * S_arr + rank % S_arr).astype(jnp.int32)
                order2 = jnp.argsort(d2, axis=1)
                counts2 = jax.vmap(
                    lambda d: jnp.bincount(d, length=n_buckets)
                )(d2).astype(jnp.int32)
                order = order.at[jnp.asarray(skewed)].set(order2)
                counts = counts.at[jnp.asarray(skewed)].set(counts2)
                offsets = jnp.cumsum(counts, axis=1) - counts
            # weight-zero (digit 0) sub-buckets never accumulate
            counts = jnp.where(w0_mask, 0, counts)
            max_count = jnp.max(counts)

            counts_f = jnp.concatenate(
                [counts.reshape(-1), jnp.zeros(Lp - L, jnp.int32)]
            )
            offsets_f = jnp.concatenate(
                [offsets.reshape(-1), jnp.zeros(Lp - L, jnp.int32)]
            )

            def acc_body(state):
                r, acc = state
                slot = jnp.clip(offsets_f + r, 0, CH - 1)
                src = order[win_of_lane, slot]  # (Lp,) chunk point index
                # point-major gather (contiguous 192-byte affine rows),
                # then a small (Lp, 2, 24) -> (2, 24, Lp) relayout
                pts = P_t[src].transpose(1, 2, 0)
                valid = (r < counts_f) & (inf_t[src] == 0)
                return r + 1, madd(acc, pts, valid, s_tile)

            _, acc = jax.lax.while_loop(
                lambda s: s[0] < max_count,
                acc_body,
                (jnp.int32(0), acc),
            )
            return acc

        acc = jax.lax.fori_loop(0, n_chunks, chunk_body, identity_lanes())

        if n_fold:
            # fold spread sub-buckets: log2(S) masked neighbor adds,
            # then the static permutation moves B_d to lane d (identity
            # where no digit lives)
            lane_idx0 = jnp.arange(Lp, dtype=jnp.int32)
            fm = jnp.asarray(fold_masks)

            def fold_body(k, acc):
                step = jnp.left_shift(jnp.int32(1), k)
                srcx = jnp.minimum(lane_idx0 + step, Lp - 1)
                return addsel(acc, acc[:, :, srcx], fm[k], s_tile)

            acc = jax.lax.fori_loop(0, n_fold, fold_body, acc)
            acc = jnp.where(
                jnp.asarray(perm_valid)[None, None, :],
                acc[:, :, jnp.asarray(perm)],
                identity_lanes(),
            )

        # suffix scan within each window's bucket lane-range, twice:
        # suffix[j] = sum_{k>=j} B_k, then total = (suffix of suffix)[1]
        lane_idx = jnp.arange(Lp, dtype=jnp.int32)
        bucket_of_lane = lane_idx % n_buckets

        def suffix_scan(acc):
            def body(i, acc):
                shift = jnp.left_shift(jnp.int32(1), i)
                src = jnp.minimum(lane_idx + shift, Lp - 1)
                shifted = acc[:, :, src]
                ok = bucket_of_lane < n_buckets - shift
                return addsel(acc, shifted, ok, s_tile)

            return jax.lax.fori_loop(0, c, body, acc)

        suffix = suffix_scan(acc)
        # zero bucket-0 lanes (weight 0), then scan again
        not_b0 = bucket_of_lane != 0
        idp = identity_lanes()
        suffix = jnp.where(not_b0[None, None, :], suffix, idp)
        total = suffix_scan(suffix)
        # window sums live at bucket lane 1 of each window
        win_lanes = jnp.arange(n_windows, dtype=jnp.int32) * n_buckets + 1
        return total[:, :, win_lanes]  # (3, 24, n_windows)

    if not interpret:
        run = jax.jit(run)
    return run, n_windows


# ----------------------------------------------------- v3 balanced drain
#
# Measured on chip (tools/profile_msm*.py, round 3): the v2 drain's
# per-round cost is madd latency (~1.5 ms @ 90k lanes) + an in-loop
# random row gather (~1.7 ms; ~19 ns/row whether monotone or random),
# and the data-dependent round count is max bucket occupancy — 2.7x the
# mean even for uniform scalars (Poisson tail + stuck-bit windows).
# Both factors multiply: ~3.2 ms x 685 rounds = the entire 3.2 s of a
# 2^20 MSM.
#
# v3 removes both:
#   * each window's points are sorted by digit ONCE per chunk (one bulk
#     gather + one tiled transpose, OUTSIDE the sequential chain), so
#     the drain reads CONTIGUOUS slabs — no in-loop gather;
#   * lanes are equal-length blocks of the sorted stream (not buckets),
#     so the drain is a STATIC T = stream/lanes rounds at 100% lane
#     occupancy, immune to any digit distribution.
# Run boundaries (bucket changes inside a block) reset the accumulator
# in-loop (one cheap select); every post-add accumulator is traced, so
# each run's sum is recovered afterwards with ONE gather at its end
# round.  The flattened key stream (window*2^c + digit) is globally
# non-decreasing, hence runs of the same bucket are adjacent and there
# are provably <= L + Lp of them (distinct keys + block splits); a
# masked segmented suffix scan merges them, and each bucket's total is
# looked up by device searchsorted into the same (window, bucket) lane
# layout the v2 suffix scans consume.  No spread/fold machinery needed.


@functools.cache
def _msm_program_v3(N: int, c: int, nbits: int, s_tile: int,
                    interpret: bool, chunk: int = 1 << 18,
                    kind: str = "g1"):
    """Build + jit the balanced-drain MSM device program (see block
    comment above).  Same contract as _msm_program: returns (run,
    n_windows) with run(P_am, inf, scalars) -> (n_proj, 24, n_windows)
    projective window sums.  Requires inf points to carry zero scalars
    (msm_lm enforces this), so validity is just digit != 0."""
    import jax
    import jax.numpy as jnp

    from . import weierstrass as wst

    wst.warmup("jax")
    F = fp_field("jax")
    n_windows = (nbits + c - 1) // c
    n_buckets = 1 << c
    L = n_windows * n_buckets
    Lp = _pad_lanes(L, s_tile)
    n_aff = 2 if kind == "g1" else 4
    n_proj = 3 if kind == "g1" else 6
    one_plane = 1 if kind == "g1" else 2
    madd = madd_select_lm if kind == "g1" else madd_select_g2_lm
    addsel = add_select_lm if kind == "g1" else add_select_g2_lm

    one_mont = F.R_mod_p % F.p
    one_limbs = np.array(
        [(one_mont >> (16 * i)) & 0xFFFF for i in range(N_LIMB)], np.uint32
    )

    def identity_lanes(n_lanes):
        acc = jnp.zeros((n_proj, N_LIMB, n_lanes), jnp.uint32)
        return acc.at[one_plane].set(jnp.asarray(one_limbs)[:, None])

    def window_digits(scalars):
        outs = []
        for w in range(n_windows):
            bit0 = w * c
            limb_i = bit0 // 16
            shift = bit0 % 16
            v = scalars[:, limb_i] >> shift
            rem = 16 - shift
            if rem < c and limb_i + 1 < scalars.shape[1]:
                v = v | (scalars[:, limb_i + 1] << rem)
            outs.append((v & ((1 << c) - 1)).astype(jnp.int32))
        return jnp.stack(outs)

    CH = min(N, chunk)
    n_chunks = (N + CH - 1) // CH
    N_pad = n_chunks * CH
    M = n_windows * CH           # stream length per chunk
    T = -(-M // Lp)              # static drain rounds per chunk
    M_pad = T * Lp
    # provable run-count bound: distinct keys (<= L) + block splits
    # (<= Lp); also trivially bounded by the padded stream length
    R_cap = _pad_lanes(min(L + Lp, T * Lp), s_tile)
    SENT = jnp.int32(0x7FFFFFFF)
    max_scan_log = (R_cap - 1).bit_length()
    STATIC_SCAN = 3  # covers bucket spans <= 8 blocks without a gather

    def run(P_am, inf, scalars):
        # v3 derives validity from digit != 0, so infinity rows must
        # carry zero scalars.  Folding the masking INTO the program
        # lets XLA fuse it into the digit extraction's read of
        # `scalars` — the caller-side jnp.where materialized a full
        # (N, 16) copy (1 GiB at 2^24; round-5 v12 G2 OOM component).
        scalars = jnp.where(
            (inf != 0)[:, None], jnp.zeros_like(scalars), scalars
        )
        if N_pad != N:
            P_am = jnp.pad(P_am, ((0, N_pad - N), (0, 0), (0, 0)))
            inf = jnp.pad(inf, (0, N_pad - N), constant_values=1)
            scalars = jnp.pad(scalars, ((0, N_pad - N), (0, 0)))

        idp_Lp = identity_lanes(Lp)
        idp_R = identity_lanes(R_cap)
        lane_r = jnp.arange(R_cap, dtype=jnp.int32)
        qkeys = jnp.arange(Lp, dtype=jnp.int32)  # lane q == key q for q < L

        def chunk_body(t, bucket_acc):
            P_t = jax.lax.dynamic_slice(
                P_am, (t * CH, 0, 0), (CH, n_aff, 24)
            )
            s_t = jax.lax.dynamic_slice(scalars, (t * CH, 0), (CH, 16))
            digits = window_digits(s_t)                       # (W, CH)
            order = jnp.argsort(digits, axis=1)
            d_sorted = jnp.sort(digits, axis=1)
            key = (
                jnp.arange(n_windows, dtype=jnp.int32)[:, None] * n_buckets
                + d_sorted
            )
            key_flat = key.reshape(M)
            valid_flat = d_sorted.reshape(M) != 0
            if M_pad != M:
                key_flat = jnp.concatenate(
                    [key_flat, jnp.full(M_pad - M, SENT, jnp.int32)]
                )
                valid_flat = jnp.concatenate(
                    [valid_flat, jnp.zeros(M_pad - M, bool)]
                )
            posm = jnp.arange(M_pad, dtype=jnp.int32)
            nr_flat = jnp.concatenate(
                [jnp.ones(1, bool), key_flat[1:] != key_flat[:-1]]
            ) | (posm % T == 0)

            # run compaction, stream order (keys globally sorted)
            starts_p = jnp.argsort(
                ~nr_flat, stable=True
            )[:R_cap].astype(jnp.int32)
            R_dyn = jnp.sum(nr_flat.astype(jnp.int32))
            ridx = jnp.arange(R_cap, dtype=jnp.int32)
            run_valid = ridx < R_dyn
            next_start = jnp.concatenate(
                [starts_p[1:], jnp.full((1,), M_pad, jnp.int32)]
            )
            ends_p = jnp.clip(
                jnp.where(ridx >= R_dyn - 1, M_pad - 1, next_start - 1),
                0, M_pad - 1,
            )
            run_key = jnp.where(run_valid, key_flat[starts_p], SENT)

            # materialize the sorted stream (bulk gather + one transpose)
            gidx = order.reshape(M)
            if M_pad != M:
                gidx = jnp.concatenate(
                    [gidx, jnp.zeros(M_pad - M, gidx.dtype)]
                )
            P_lin = P_t[gidx]                                 # (M_pad, a, 24)
            P_sched = P_lin.reshape(Lp, T, n_aff, 24).transpose(1, 2, 3, 0)
            nr_s = nr_flat.reshape(Lp, T).T                   # (T, Lp)
            val_s = valid_flat.reshape(Lp, T).T

            trace0 = jnp.zeros((n_proj, N_LIMB, T + 1, Lp), jnp.uint32)
            trace0 = trace0.at[one_plane, :, :, :].set(
                jnp.asarray(one_limbs)[:, None, None]
            )

            def body(r, carry):
                acc, trace = carry
                pts = jax.lax.dynamic_slice(
                    P_sched, (r, 0, 0, 0), (1, n_aff, 24, Lp)
                )[0]
                nr_r = jax.lax.dynamic_slice(nr_s, (r, 0), (1, Lp))[0]
                v_r = jax.lax.dynamic_slice(val_s, (r, 0), (1, Lp))[0]
                acc = jnp.where(nr_r[None, None, :], idp_Lp, acc)
                acc = madd(acc, pts, v_r, s_tile, interpret)
                trace = jax.lax.dynamic_update_slice(
                    trace, acc[:, :, None, :], (0, 0, r + 1, 0)
                )
                return acc, trace

            _, trace = jax.lax.fori_loop(
                0, T, body, (idp_Lp, trace0)
            )

            # run sums: one gather at each run's end round
            tr2 = trace.reshape(n_proj, N_LIMB, (T + 1) * Lp)
            col = (ends_p % T + 1) * Lp + ends_p // T
            runsum = tr2[:, :, col]                           # (p, 24, R_cap)
            runsum = jnp.where(run_valid[None, None, :], runsum, idp_R)

            # segmented suffix scan: merge same-key runs into the first
            def scan_step(acc_r, shifted, m):
                return addsel(acc_r, shifted, m.astype(jnp.uint32),
                              s_tile, interpret)

            acc_r = runsum
            for k in range(STATIC_SCAN):  # static steps: free shifts
                step = 1 << k
                shifted = jnp.concatenate(
                    [acc_r[:, :, step:], idp_R[:, :, :step]], axis=2
                )
                kshift = jnp.concatenate(
                    [run_key[step:], jnp.full(step, SENT, jnp.int32)]
                )
                m = (kshift == run_key) & (run_key < SENT)
                acc_r = scan_step(acc_r, shifted, m)

            def tail_body(state):
                k, acc_r, _ = state
                step = jnp.left_shift(jnp.int32(1), k)
                src = jnp.minimum(lane_r + step, R_cap - 1)
                m = (
                    (lane_r + step < R_cap)
                    & (run_key[src] == run_key)
                    & (run_key < SENT)
                )
                acc_r = scan_step(acc_r, acc_r[:, :, src], m)
                return k + 1, acc_r, jnp.any(m)

            def tail_cond(state):
                k, _, moved = state
                return moved & (k < max_scan_log)

            # seed the tail's `moved` with whether any span survives the
            # static rounds (a key equal at distance 2^STATIC_SCAN)
            ksh = jnp.concatenate(
                [run_key[1 << STATIC_SCAN:],
                 jnp.full(1 << STATIC_SCAN, SENT, jnp.int32)]
            )
            moved0 = jnp.any((ksh == run_key) & (run_key < SENT))
            _, acc_r, _ = jax.lax.while_loop(
                tail_cond, tail_body,
                (jnp.int32(STATIC_SCAN), acc_r, moved0),
            )

            # bucket placement: first run of key q holds bucket q's sum
            pos = jnp.searchsorted(run_key, qkeys).astype(jnp.int32)
            pos_c = jnp.clip(pos, 0, R_cap - 1)
            hit = (run_key[pos_c] == qkeys) & (qkeys < L)
            bsum = acc_r[:, :, pos_c]
            return addsel(bucket_acc, bsum, hit.astype(jnp.uint32),
                          s_tile, interpret)

        acc = jax.lax.fori_loop(
            0, n_chunks, chunk_body, identity_lanes(Lp)
        )

        # suffix scans (identical to v2): total_w = Sigma_j>=1 S_j
        lane_idx = jnp.arange(Lp, dtype=jnp.int32)
        bucket_of_lane = lane_idx % n_buckets

        def suffix_scan(acc):
            def body(i, acc):
                shift = jnp.left_shift(jnp.int32(1), i)
                src = jnp.minimum(lane_idx + shift, Lp - 1)
                shifted = acc[:, :, src]
                ok = bucket_of_lane < n_buckets - shift
                return addsel(acc, shifted, ok, s_tile, interpret)

            return jax.lax.fori_loop(0, c, body, acc)

        suffix = suffix_scan(acc)
        not_b0 = bucket_of_lane != 0
        idp = identity_lanes(Lp)
        suffix = jnp.where(not_b0[None, None, :], suffix, idp)
        total = suffix_scan(suffix)
        win_lanes = jnp.arange(n_windows, dtype=jnp.int32) * n_buckets + 1
        return total[:, :, win_lanes]

    if not interpret:
        run = jax.jit(run)
    return run, n_windows


# ------------------------------------------------- duplicate-scalar presum
#
# Witness MSMs (Groth16 a/b/l queries × the assignment z) violate the
# random-scalar assumption behind bucket-serial draining: hundreds of
# thousands of wires share tiny values (booleans = 1, selector
# constants), so ONE bucket holds ~N/3 points and the drain's
# data-dependent while_loop runs ~N/3 rounds — hours of device time
# (the TPU watchdog kills it).  bellman never sees this because its
# per-core bucket walk costs points, not max-bucket.
#
# Fix: pre-reduce duplicate groups.  The host groups scalars
# (np.unique); groups larger than a threshold are summed on device with
# a BALANCED RUN DECOMPOSITION (cuZK-style): points sorted by group,
# split into K equal lanes, a run = maximal same-group span within a
# lane, so every run has length <= ceil(H/K) and the drain is a STATIC
# fori_loop — immune to any duplicate distribution.  Partials merge
# with a segmented Hillis-Steele suffix scan (host-precomputed masks).
# The group sums then REPLACE one member of their group in the query
# array (scalars of the rest zeroed — weight-0), so the downstream MSM
# keeps its compiled shape and sees near-unique scalars.


class _DedupPlan:
    """Host-side reduction plan for one scalar vector (shared by every
    MSM over the same scalars: a_query, b_g1_query, b_g2_query)."""

    K = 2048  # drain lanes
    M_QUANT = 64  # round-count quantum (bounds compile-cache entries)

    def __init__(self, s_np: Optional[np.ndarray], threshold: int = 8,
                 _parts=None):
        if _parts is not None:  # derived plan (see derive_shifted)
            hpos, lab, heavy_rows = _parts
            self.n_heavy_vals = V = int(heavy_rows.shape[0])
            self.active = V > 0
            if not self.active:
                return
            self.hpos = hpos.astype(np.int32)
            self.heavy_scalars = heavy_rows
            self._lab = lab
            self._build(lab, V)
            return
        from ..native import native_group_rows16

        grp = native_group_rows16(s_np)
        if grp is not None:
            # C++ index sort (~10x np.unique's void-row lexsort at 2^20)
            order_all, inverse, counts, _ng = grp
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            uniq_rows = np.ascontiguousarray(s_np, np.uint32)[
                order_all[starts]
            ]
        else:
            v = np.ascontiguousarray(s_np).view([("", np.uint32)] * 16).ravel()
            uniq, inverse, counts = np.unique(
                v, return_inverse=True, return_counts=True
            )
            uniq_rows = uniq.view(np.uint32).reshape(-1, 16)
        zero_u = (uniq_rows == 0).all(axis=1)
        heavy_u = (counts > threshold) & ~zero_u
        self.n_heavy_vals = V = int(heavy_u.sum())
        self.active = V > 0
        if not self.active:
            return
        hvals = np.flatnonzero(heavy_u)
        elem_heavy = heavy_u[inverse]
        hm_pos = np.flatnonzero(elem_heavy)
        labels = np.searchsorted(hvals, inverse[hm_pos]).astype(np.int64)
        order = np.argsort(labels, kind="stable")
        self.hpos = hm_pos[order].astype(np.int32)  # device gather/scatter
        lab = labels[order]
        self.heavy_scalars = uniq_rows[hvals]  # (V, 16) std limbs
        self._lab = lab
        self._build(lab, V)

    def derive_shifted(self, n_inputs: int) -> "_DedupPlan":
        """Plan for the aux vector aux[j] = z[j + n_inputs]: reuse this
        plan's grouping instead of a second np.unique pass (the input
        prefix is a handful of positions).  Groups left empty are
        dropped."""
        if not self.active:
            return self
        keep = self.hpos >= n_inputs
        hpos2 = self.hpos[keep] - n_inputs
        lab2 = self._lab[keep]
        present = np.unique(lab2)
        relab = np.searchsorted(present, lab2)
        return _DedupPlan(
            None, _parts=(hpos2, relab, self.heavy_scalars[present])
        )

    def _build(self, lab, V):
        H = lab.shape[0]
        self.n_heavy_elems = H

        # adaptive lane count: target ~M_QUANT rounds so small inputs
        # (tests, small circuits) get small compiled shapes
        K = 8
        while K < self.K and K * self.M_QUANT < H:
            K *= 2
        m = -(-H // K)
        m = -(-m // self.M_QUANT) * self.M_QUANT  # quantize rounds
        Hp = m * K
        lab_p = np.full(Hp, V, dtype=np.int64)  # sentinel pad group
        lab_p[:H] = lab
        t = np.arange(Hp)
        head = (t % m == 0) | np.concatenate([[True], lab_p[1:] != lab_p[:-1]])
        run_id = np.cumsum(head) - 1
        R = int(run_id[-1]) + 1
        Ks = _pad_lanes(R, 8)
        run_start = np.searchsorted(run_id, np.arange(Ks), side="left")
        run_end = np.searchsorted(run_id, np.arange(Ks), side="right")
        run_len = (run_end - run_start).astype(np.int32)
        run_lab = np.full(Ks, V, dtype=np.int64)
        run_lab[:R] = lab_p[np.minimum(run_start[:R], Hp - 1)]
        run_len[run_lab >= V] = 0  # pad/sentinel runs never add
        self.m, self.Hp, self.Ks = m, Hp, Ks
        self.run_start = run_start.astype(np.int32)
        self.run_len = run_len
        # segmented suffix-scan masks: lane s absorbs s+2^k while the
        # absorbed lane still belongs to the same group
        n_rounds = max(1, (Ks - 1).bit_length())
        lane = np.arange(Ks)
        masks = np.zeros((n_rounds, Ks), np.uint32)
        for k in range(n_rounds):
            step = 1 << k
            src = np.minimum(lane + step, Ks - 1)
            masks[k] = ((lane + step < Ks)
                        & (run_lab[src] == run_lab)
                        & (run_lab < V)).astype(np.uint32)
        self.fold_masks = masks
        # group g's total lands at the first run-lane of g
        self.first_lane = np.searchsorted(run_lab[:R], np.arange(V)).astype(
            np.int32
        )
        # one slot per group reuses the group's first original position
        self.slots = np.array(
            [self.hpos[np.searchsorted(lab, g)] for g in range(V)], np.int32
        )


@functools.cache
def _g1_presum_fn(m: int, Hp: int, Ks: int, n_rounds: int, s_tile: int,
                  interpret: bool):
    import jax
    import jax.numpy as jnp

    from . import weierstrass as wst

    wst.warmup("jax")  # cached curve constants must materialize untraced
    F = fp_field("jax")
    one_mont = F.R_mod_p % F.p
    one_limbs = np.array(
        [(one_mont >> (16 * i)) & 0xFFFF for i in range(N_LIMB)], np.uint32
    )

    def run(P_am, inf, gidx, run_start, run_len, fold_masks):
        # Indirect per-round gather: each round reads (Ks, 2, 24) rows of
        # the FULL query through gidx instead of pre-gathering a
        # contiguous (Hp, 2, 24) copy.  At Np = 2^24 the upfront copy
        # is GBs on top of the widened query (round-4 b256 G2 OOM); the
        # per-round gather's transient is ~Ks rows.  Pad runs carry
        # run_len = 0 (sentinel label), so out-of-range gidx entries
        # (clamped to 0) never contribute.
        acc = jnp.zeros((3, N_LIMB, Ks), jnp.uint32)
        acc = acc.at[1].set(jnp.asarray(one_limbs)[:, None])

        def body(r, acc):
            pos = jnp.clip(run_start + r, 0, Hp - 1)
            gpos = gidx[pos]
            valid = (r < run_len) & (inf[gpos] == 0)
            # accepts the NARROW (uint16) query too: the per-round
            # (Ks, 2, 24) gather widens for free, so big mode can
            # presum without materializing the widened full query
            pts = P_am[gpos].astype(jnp.uint32).transpose(1, 2, 0)
            return madd_select_lm(acc, pts, valid, s_tile, interpret)

        acc = jax.lax.fori_loop(0, m, body, acc)
        lane = jnp.arange(Ks, dtype=jnp.int32)

        def cbody(k, acc):
            step = jnp.left_shift(jnp.int32(1), k)
            src = jnp.minimum(lane + step, Ks - 1)
            return add_select_lm(acc, acc[:, :, src], fold_masks[k], s_tile,
                                 interpret)

        return jax.lax.fori_loop(0, n_rounds, cbody, acc)

    if not interpret:
        run = jax.jit(run)
    return run


def _presum_gidx(plan: _DedupPlan):
    """(Hp,) device indices into the full query: heavy positions followed
    by zero-padding (pad runs have run_len = 0 so the pads never add)."""
    import jax.numpy as jnp

    pad = plan.Hp - plan.n_heavy_elems
    return jnp.concatenate(
        [jnp.asarray(plan.hpos), jnp.zeros(pad, jnp.int32)]
    )


def presum_g1(P_am, inf, plan: _DedupPlan, s_tile: int = 8,
              interpret: bool = False):
    """Sum each heavy group's points.  Returns ((V, 2, 24) affine sums,
    (V,) inf mask) aligned with plan.heavy_scalars."""
    import jax.numpy as jnp

    from . import weierstrass as wst

    xp = jnp
    fn = _g1_presum_fn(plan.m, plan.Hp, plan.Ks,
                       plan.fold_masks.shape[0], s_tile, interpret)
    acc = fn(P_am, inf, _presum_gidx(plan), xp.asarray(plan.run_start),
             xp.asarray(plan.run_len), xp.asarray(plan.fold_masks))
    sums = acc[:, :, xp.asarray(plan.first_lane)]  # (3, 24, V) proj
    proj = (sums[0].T, sums[1].T, sums[2].T)
    return wst.g1_proj_to_am(proj, "jax")


@functools.cache
def _zero_rows_fn():
    """jitted: zero the given rows of an (N, 16) scalar tensor.  The
    (…, 16) minor dim packs the TPU tile exactly (128/16), so this
    scatter is layout-clean — unlike any scatter into the (N, 2, 24)
    point tensor, whose 24-limb minor dim forces a T(2,128) padded
    relayout COPY (5.3x, 16 GB at Np = 2^24; round-4 OOM)."""
    import jax

    def run(scalars_std, hpos):
        return scalars_std.at[hpos].set(0)

    return jax.jit(run)


# --------------------------------------------------------------- host API


def _use_v3(N: int, chunk: int) -> bool:
    """Balanced drain engages for chunk-sized-and-up MSMs (where the
    v2 drain's occupancy tail and in-loop gather dominate); the
    override BAZUKA_MSM_ALGO=v2|v3 forces either path everywhere."""
    import os

    algo = os.environ.get("BAZUKA_MSM_ALGO")
    if algo == "v2":
        return False
    if algo == "v3":
        return True
    return N >= chunk


def points_to_am(points, backend: str = "jax"):
    """Host affine G1 points ((x, y) or None) -> ((N, 2, 24) point-major
    Montgomery affine array, (N,) uint32 infinity mask): each point is
    one contiguous 192-byte row, so per-round bucket gathers are row
    reads (upload once, reuse across proofs)."""
    from . import weierstrass as wst

    K = wst.fp_ops(backend)
    xp = K.xp
    xs = K.encode([p[0] if p else 0 for p in points])
    ys = K.encode([p[1] if p else 0 for p in points])
    inf = xp.asarray(
        np.array([1 if p is None else 0 for p in points], np.uint32)
    )
    return xp.stack([xs, ys], axis=1), inf


def make_dedup_plan(s_np: np.ndarray, threshold: int = 8):
    """Host (N, 16) std-form scalar limbs -> reduction plan (see
    _DedupPlan).  Build ONCE per scalar vector and share across every
    query multiplied by it (a/b G1 + b G2)."""
    return _DedupPlan(s_np, threshold)


def msm_lm(P_am, inf, scalars_std, c: int = 12, nbits: int = 255,
           s_tile: int = 8, interpret: bool = False, chunk: int = 1 << 18,
           dedup_plan: Optional[_DedupPlan] = None):
    """Device MSM core: point-major affine points ((N, 2, 24) + (N,)
    infinity mask) x (N, 16) standard Fr limbs -> host affine point (or
    None).

    One jitted device program computes all window sums (mixed-add
    bucket accumulation, projective fold + suffix scans); the final
    window combine (c doublings + add per window) runs host-side.
    Pass dedup_plan for duplicate-heavy scalar vectors (witnesses)."""
    import jax.numpy as jnp

    from ..crypto import bls12_381 as bls
    from . import weierstrass as wst

    if dedup_plan is not None and dedup_plan.active:
        # Dedup as MSM splitting (never scatter into the point tensor —
        # see _zero_rows_fn): Σ s_i·P_i = Σ_{light} s_i·P_i
        #                              + Σ_{heavy vals v} v·(Σ_{group} P_i)
        # The heavy groups are presummed on device and finished as a
        # tiny V-point MSM; the main drain runs with heavy rows zeroed.
        plan = dedup_plan
        sum_am, sum_inf = presum_g1(P_am, inf, plan)
        V = int(plan.heavy_scalars.shape[0])
        # finish the tiny V-point MSM FIRST and free its buffers so
        # the main drain's scratch never coexists with the presum
        # gather transients (big-domain HBM discipline, round 4)
        extra = msm_lm(sum_am, sum_inf, jnp.asarray(plan.heavy_scalars),
                       c=4 if V < (1 << 12) else 8, nbits=nbits,
                       s_tile=s_tile, interpret=interpret, chunk=chunk)
        del sum_am, sum_inf
        scal = _zero_rows_fn()(scalars_std, jnp.asarray(plan.hpos))
        del scalars_std  # big-mode HBM: drop this frame's 1 GiB ref
        main = msm_lm(P_am, inf, scal, c=c, nbits=nbits, s_tile=s_tile,
                      interpret=interpret, chunk=chunk)
        del scal
        if main is None:
            return extra
        return bls.g1_add(main, extra) if extra is not None else main
    N = int(scalars_std.shape[0])
    if _use_v3(N, chunk):
        # infinity rows -> zero scalars is enforced INSIDE the program
        run, n_windows = _msm_program_v3(
            N, c, nbits, s_tile, interpret, chunk
        )
    else:
        run, n_windows = _msm_program(N, c, nbits, s_tile, interpret, chunk)
    wins = np.asarray(run(P_am, inf, scalars_std))  # (3, 24, W)
    K_np = wst.fp_ops("np")
    host_pts = wst.g1_from_proj(
        K_np, (wins[0].T, wins[1].T, wins[2].T)
    )
    acc = None
    for w in range(n_windows - 1, -1, -1):
        for _ in range(c):
            acc = bls.g1_add(acc, acc)
        acc = bls.g1_add(acc, host_pts[w])
    return acc


def msm_g1_host_v2(points, scalars, backend: str = "jax", c: int = 12,
                   nbits: int = 255, chunk: int = 1 << 18):
    """Host affine points + int scalars -> host affine point."""
    from .msm import _enc_scalars

    P_am, inf = points_to_am(points, backend)
    s = _enc_scalars(scalars, backend)
    return msm_lm(P_am, inf, s, c=c, nbits=nbits, chunk=chunk)


# ----------------------------------------------------------------- G2 MSM


def points_to_am_g2(points, backend: str = "jax"):
    """Host affine G2 points (((x0,x1),(y0,y1)) or None) -> ((N, 4, 24)
    point-major Montgomery affine array, (N,) uint32 infinity mask)."""
    from . import weierstrass as wst

    K = wst.fp2_ops(backend)
    F = K.F
    xp = F.xp
    coords = []
    for sel in ((0, 0), (0, 1), (1, 0), (1, 1)):
        coords.append(
            F.encode([p[sel[0]][sel[1]] if p else 0 for p in points])
        )
    inf = xp.asarray(
        np.array([1 if p is None else 0 for p in points], np.uint32)
    )
    return xp.stack(coords, axis=1), inf


def msm_lm_g2(P_am, inf, scalars_std, c: int = 12, nbits: int = 255,
              s_tile: int = 8, interpret: bool = False,
              chunk: int = 1 << 18, dedup_plan: Optional[_DedupPlan] = None):
    """G2 MSM on the v2 pipeline: (N, 4, 24) point-major affine +
    (N,) infinity mask x (N, 16) std Fr limbs -> host affine G2 point."""
    from ..crypto import bls12_381 as bls
    from . import weierstrass as wst

    if dedup_plan is not None and dedup_plan.active:
        # MSM splitting (same as msm_lm): presummed heavy groups finish
        # in a tiny V-point MSM; no scatter into the (N, 4, 24) tensor.
        import jax.numpy as jnp

        plan = dedup_plan
        sum_am, sum_inf = presum_g2_am(P_am, inf, plan, s_tile, interpret)
        V = int(plan.heavy_scalars.shape[0])
        extra = msm_lm_g2(sum_am, sum_inf,
                          jnp.asarray(plan.heavy_scalars),
                          c=4 if V < (1 << 12) else 8, nbits=nbits,
                          s_tile=s_tile, interpret=interpret, chunk=chunk)
        del sum_am, sum_inf  # before the main drain's scratch (HBM)
        scal = _zero_rows_fn()(scalars_std, jnp.asarray(plan.hpos))
        del scalars_std  # big-mode HBM: drop this frame's 1 GiB ref
        main = msm_lm_g2(P_am, inf, scal, c=c, nbits=nbits, s_tile=s_tile,
                         interpret=interpret, chunk=chunk)
        del scal
        if main is None:
            return extra
        return bls.g2_add(main, extra) if extra is not None else main
    N = int(scalars_std.shape[0])
    if _use_v3(N, chunk):
        # infinity rows -> zero scalars is enforced INSIDE the program
        run, n_windows = _msm_program_v3(
            N, c, nbits, s_tile, interpret, chunk, "g2"
        )
    else:
        run, n_windows = _msm_program(N, c, nbits, s_tile, interpret,
                                      chunk, "g2")
    wins = np.asarray(run(P_am, inf, scalars_std))  # (6, 24, W)
    K_np = wst.fp2_ops("np")
    host_pts = wst.g2_from_proj(
        K_np,
        ((wins[0].T, wins[1].T), (wins[2].T, wins[3].T),
         (wins[4].T, wins[5].T)),
    )
    acc = None
    for w in range(n_windows - 1, -1, -1):
        for _ in range(c):
            acc = bls.g2_add(acc, acc)
        acc = bls.g2_add(acc, host_pts[w])
    return acc


@functools.cache
def _g2_presum_am_fn(m: int, Hp: int, Ks: int, n_rounds: int, s_tile: int,
                     interpret: bool):
    import jax
    import jax.numpy as jnp

    from . import weierstrass as wst

    wst.warmup("jax")
    F = fp_field("jax")
    one_mont = F.R_mod_p % F.p
    one_limbs = np.array(
        [(one_mont >> (16 * i)) & 0xFFFF for i in range(N_LIMB)], np.uint32
    )

    def run(P_am, inf, gidx, run_start, run_len, fold_masks):
        # Indirect gather per round (see _g1_presum_fn): the (Hp, 4, 24)
        # upfront copy on top of the 6.4 GB widened G2 query was the
        # round-4 b256 OOM site; reading through gidx bounds the
        # transient at (Ks, 4, 24) per round.
        acc = jnp.zeros((6, N_LIMB, Ks), jnp.uint32)
        acc = acc.at[2].set(jnp.asarray(one_limbs)[:, None])

        def body(r, acc):
            pos = jnp.clip(run_start + r, 0, Hp - 1)
            gpos = gidx[pos]
            valid = (r < run_len) & (inf[gpos] == 0)
            pts = P_am[gpos].astype(jnp.uint32).transpose(1, 2, 0)
            return madd_select_g2_lm(acc, pts, valid, s_tile, interpret)

        acc = jax.lax.fori_loop(0, m, body, acc)
        lane = jnp.arange(Ks, dtype=jnp.int32)

        def cbody(k, acc):
            step = jnp.left_shift(jnp.int32(1), k)
            src = jnp.minimum(lane + step, Ks - 1)
            return add_select_g2_lm(acc, acc[:, :, src], fold_masks[k],
                                    s_tile, interpret)

        return jax.lax.fori_loop(0, n_rounds, cbody, acc)

    if not interpret:
        run = jax.jit(run)
    return run


def presum_g2_am(P_am, inf, plan: _DedupPlan, s_tile: int = 8,
                 interpret: bool = False):
    """G2 analog of presum_g1 over the (N, 4, 24) affine layout."""
    import jax.numpy as jnp

    from . import weierstrass as wst

    fn = _g2_presum_am_fn(plan.m, plan.Hp, plan.Ks,
                          plan.fold_masks.shape[0], s_tile, interpret)
    acc = fn(P_am, inf, _presum_gidx(plan), jnp.asarray(plan.run_start),
             jnp.asarray(plan.run_len), jnp.asarray(plan.fold_masks))
    sums = acc[:, :, jnp.asarray(plan.first_lane)]  # (6, 24, V) proj
    return wst.g2_proj_to_am(
        ((sums[0].T, sums[1].T), (sums[2].T, sums[3].T),
         (sums[4].T, sums[5].T)),
        "jax",
    )

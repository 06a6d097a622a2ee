"""Pallas TPU kernel for Montgomery multiplication — the innermost hot op.

Why: the jnp formulation of mul_wide materializes (B, n, 2n) uint32
intermediates in HBM (~2 GB of traffic per B=65536 call), capping
throughput at ~7M muls/s.  This kernel keeps the entire schoolbook
convolution + carry + Montgomery reduction resident in VMEM/vregs:
inputs are relaid out limb-major as (n, S, 128) so every limb-product is
a full (S, 128) vreg-elementwise multiply, and the only HBM traffic is
the operands and the result (~3 passes instead of ~30).

Layout contract: public API takes/returns the engine's (B, n) uint32
Montgomery-form arrays; the (n, B/128, 128) relayout happens around the
pallas_call (one fused transpose each way).

Bit-exact vs `LimbField.mont_mul` (asserted in tests via interpret mode
on CPU and on real TPU in the smoke/bench paths).
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.limbs import MASK, W, LimbField

LANE = 128
SUBLANE = 8


def _kernel_body(F: LimbField):
    """Build the kernel fn for a given field (n limbs, constants baked)."""
    n = F.n
    p_limbs = np.asarray(F.p_limbs).astype(np.uint32)  # (n,)
    pinv_limbs = np.asarray(F.p_inv_neg_limbs).astype(np.uint32)

    def kernel(a_ref, b_ref, out_ref):
        import jax.numpy as jnp

        mask = jnp.uint32(0xFFFF)

        def conv_full(x_rows, y_rows, out_len):
            """Schoolbook product of limb-rows lists; returns list of
            (S, 128) accumulator rows (length out_len), un-carried.
            Column sums < 2n·2^16 < 2^22: safe in uint32."""
            acc = [None] * out_len
            for i in range(len(x_rows)):
                xi = x_rows[i]
                for j in range(len(y_rows)):
                    if i + j >= out_len:
                        continue
                    prod = xi * y_rows[j]
                    lo = prod & mask
                    acc[i + j] = lo if acc[i + j] is None else acc[i + j] + lo
                    if i + j + 1 < out_len:
                        hi = prod >> W
                        acc[i + j + 1] = (
                            hi if acc[i + j + 1] is None else acc[i + j + 1] + hi
                        )
            zero = jnp.zeros_like(x_rows[0])
            return [zero if r is None else r for r in acc]

        def carry(rows):
            """Sequential carry over limb rows (static unroll; values stay
            in vregs).  Returns normalized rows + carry-out row."""
            out = []
            c = jnp.zeros_like(rows[0])
            for r in rows:
                v = r + c
                out.append(v & mask)
                c = v >> W
            return out, c

        def sub_p_if_ge(rows):
            """Conditional subtract of the modulus (branchless)."""
            diff = []
            borrow = jnp.zeros_like(rows[0])
            big = jnp.uint32(1 << W)
            for k in range(n):
                t = rows[k] + big - jnp.uint32(p_limbs[k]) - borrow
                diff.append(t & mask)
                borrow = jnp.uint32(1) - (t >> W)
            keep = borrow != 0  # borrowed => rows < p => keep rows
            return [jnp.where(keep, rows[k], diff[k]) for k in range(n)]

        a_rows = [a_ref[i] for i in range(n)]
        b_rows = [b_ref[i] for i in range(n)]

        # t = a*b (2n limbs)
        t_rows, _ = carry(conv_full(a_rows, b_rows, 2 * n))
        # m = (t mod R) * (-p^-1) mod R   (low n limbs only)
        pinv_rows = [jnp.uint32(pinv_limbs[i]) for i in range(n)]
        m_rows, _ = carry(conv_full(t_rows[:n], pinv_rows, n))
        # t + m*p, then take high n limbs
        mp_rows, _ = carry(conv_full(m_rows, [jnp.uint32(x) for x in p_limbs], 2 * n))
        s_rows, _ = carry([t_rows[k] + mp_rows[k] for k in range(2 * n)])
        hi = s_rows[n:]
        res = sub_p_if_ge(hi)
        for k in range(n):
            out_ref[k] = res[k]

    return kernel


@functools.cache
def _mont_mul_call(n: int, S: int, interpret: bool, field_key: str):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..fields.limbs import fp_field, fr_field

    F = fr_field("jax") if field_key == "fr" else fp_field("jax")
    kernel = _kernel_body(F)

    # tile the batch: per-block (n, S_TILE, 128) operands keep scratch
    # rows + accumulators well under the 16MB VMEM budget.  S is always a
    # multiple of 8 (the wrapper pads to 8*128); prefer 16 when it divides.
    S_TILE = 16 if S % 16 == 0 else 8
    assert S % S_TILE == 0

    def call(aT, bT):
        # aT, bT: (n, S, 128)
        spec = pl.BlockSpec((n, S_TILE, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(S // S_TILE,),
            out_shape=jax.ShapeDtypeStruct((n, S, LANE), np.uint32),
            in_specs=[spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(aT, bT)

    return jax.jit(call)


def pallas_mont_mul(F: LimbField, a, b, interpret: bool = False):
    """Montgomery multiply via the Pallas kernel.

    a, b: (..., n) uint32 Montgomery limbs (broadcastable); returns the
    same shape.  Batch is padded to a multiple of 1024 internally."""
    import jax.numpy as jnp

    n = F.n
    a, b = jnp.broadcast_arrays(a, b)
    shape = a.shape
    B = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    af = a.reshape(B, n)
    bf = b.reshape(B, n)
    tile = SUBLANE * LANE
    pad = (-B) % tile
    if pad:
        af = jnp.concatenate([af, jnp.zeros((pad, n), jnp.uint32)], axis=0)
        bf = jnp.concatenate([bf, jnp.zeros((pad, n), jnp.uint32)], axis=0)
    Bp = B + pad
    S = Bp // LANE
    # limb-major relayout: (Bp, n) -> (n, S, 128)
    aT = af.T.reshape(n, S, LANE)
    bT = bf.T.reshape(n, S, LANE)
    key = "fr" if F.name == "Fr" else "fp"
    outT = _mont_mul_call(n, S, interpret, key)(aT, bT)
    out = outT.reshape(n, Bp).T[:B]
    return out.reshape(shape)

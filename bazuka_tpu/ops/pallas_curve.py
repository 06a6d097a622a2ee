"""Fused Pallas kernel for the complete G1 point addition (RCB15 a=0).

One kernel call = the entire 12-mul + ~29-add/sub formula, all
register/VMEM-resident in limb-major (n, S, 128) layout.  This removes
the remaining HBM-bound jnp add/sub traffic that dominated the MSM after
the Montgomery-mul kernel landed (measured: proj_add was ~5x slower than
its mul count implies).

Field element lists-of-rows convention: a value is a list of n rows,
each row a (S_TILE, 128) uint32 array of one 16-bit limb across the
batch.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.limbs import W, LimbField
from .pallas_field import LANE, SUBLANE

S_TILE = 8


def field_emitters(F: LimbField):
    """In-kernel field ops over lists of limb rows (jnp on vregs)."""
    import jax.numpy as jnp

    n = F.n
    mask = 0xFFFF  # python ints: avoid captured device constants in pallas
    big = 1 << W
    # host ints (NOT np.asarray of device arrays — the emitters must be
    # buildable inside an enclosing jit trace)
    p_limbs = [(F.p >> (16 * i)) & 0xFFFF for i in range(n)]
    pinv_limbs = [(F.p_inv_neg >> (16 * i)) & 0xFFFF for i in range(n)]

    def carry(rows):
        out = []
        c = jnp.zeros_like(rows[0])
        for r in rows:
            v = r + c
            out.append(v & mask)
            c = v >> W
        return out, c

    def conv(x_rows, y_rows, out_len):
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

    def sub_raw(a_rows, b_rows):
        out = []
        borrow = jnp.zeros_like(a_rows[0])
        for k in range(n):
            t = a_rows[k] + big - b_rows[k] - borrow
            out.append(t & mask)
            borrow = 1 - (t >> W)
        return out, borrow

    def cond_sub_p(rows):
        diff, borrow = sub_raw(rows, [jnp.full(rows[0].shape, pr, jnp.uint32) for pr in p_limbs])
        keep = borrow != 0
        return [jnp.where(keep, rows[k], diff[k]) for k in range(n)]

    def fadd(a_rows, b_rows):
        s, _ = carry([a_rows[k] + b_rows[k] for k in range(n)])
        return cond_sub_p(s)

    def fsub(a_rows, b_rows):
        d, borrow = sub_raw(a_rows, b_rows)
        dp, _ = carry([d[k] + p_limbs[k] for k in range(n)])
        under = borrow != 0
        return [jnp.where(under, dp[k], d[k]) for k in range(n)]

    def fmul(a_rows, b_rows):
        t_rows, _ = carry(conv(a_rows, b_rows, 2 * n))
        pinv_rows = pinv_limbs
        m_rows, _ = carry(conv(t_rows[:n], pinv_rows, n))
        mp_rows, _ = carry(conv(m_rows, p_limbs, 2 * n))
        s_rows, _ = carry([t_rows[k] + mp_rows[k] for k in range(2 * n)])
        return cond_sub_p(s_rows[n:])

    return fadd, fsub, fmul


@functools.cache
def _g1_add_call(S: int, interpret: bool):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..fields.limbs import fp_field
    from .weierstrass import G1_B3

    F = fp_field("jax")
    n = F.n
    fadd, fsub, fmul = field_emitters(F)
    b3_mont = (G1_B3 * F.R_mod_p) % F.p
    b3_limbs = [int((b3_mont >> (16 * i)) & 0xFFFF) for i in range(n)]

    def kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        import jax.numpy as jnp

        X1 = [x1[i] for i in range(n)]
        Y1 = [y1[i] for i in range(n)]
        Z1 = [z1[i] for i in range(n)]
        X2 = [x2[i] for i in range(n)]
        Y2 = [y2[i] for i in range(n)]
        Z2 = [z2[i] for i in range(n)]
        b3 = [jnp.full(X1[0].shape, v, jnp.uint32) for v in b3_limbs]

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
        t2b = fmul(b3, t2)
        Z3 = fadd(t1, t2b)
        t1m = fsub(t1, t2b)
        Y3b = fmul(b3, Y3)
        X3r = fsub(fmul(t3, t1m), fmul(t4, Y3b))
        Y3r = fadd(fmul(Y3b, X3), fmul(t1m, Z3))
        Z3r = fadd(fmul(Z3, t4), fmul(X3, t3))
        for k in range(n):
            ox[k] = X3r[k]
            oy[k] = Y3r[k]
            oz[k] = Z3r[k]

    def call(x1, y1, z1, x2, y2, z2):
        spec = pl.BlockSpec((n, S_TILE, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        shapes = tuple(
            jax.ShapeDtypeStruct((n, S, LANE), np.uint32) for _ in range(3)
        )
        return pl.pallas_call(
            kernel,
            grid=(S // S_TILE,),
            out_shape=shapes,
            in_specs=[spec] * 6,
            out_specs=(spec, spec, spec),
            interpret=interpret,
        )(x1, y1, z1, x2, y2, z2)

    return jax.jit(call)


@functools.cache
def _g2_add_call(S: int, interpret: bool):
    """Fused complete G2 add: same RCB15 skeleton over Fp2 rows
    (Karatsuba on the in-kernel Fp emitters)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..fields.limbs import fp_field
    from .weierstrass import G2_B3

    F = fp_field("jax")
    n = F.n
    fadd, fsub, fmul = field_emitters(F)

    def f2add(a, b):
        return (fadd(a[0], b[0]), fadd(a[1], b[1]))

    def f2sub(a, b):
        return (fsub(a[0], b[0]), fsub(a[1], b[1]))

    def f2mul(a, b):
        t0 = fmul(a[0], b[0])
        t1 = fmul(a[1], b[1])
        t2 = fmul(fadd(a[0], a[1]), fadd(b[0], b[1]))
        return (fsub(t0, t1), fsub(fsub(t2, t0), t1))

    def mont_limbs(x: int):
        xm = (x * F.R_mod_p) % F.p
        return [int((xm >> (16 * i)) & 0xFFFF) for i in range(n)]

    b3c0 = mont_limbs(G2_B3[0])
    b3c1 = mont_limbs(G2_B3[1])

    def kernel(*refs):
        import jax.numpy as jnp

        ins = refs[:12]
        outs = refs[12:]

        def rd(ref):
            return [ref[i] for i in range(n)]

        X1 = (rd(ins[0]), rd(ins[1]))
        Y1 = (rd(ins[2]), rd(ins[3]))
        Z1 = (rd(ins[4]), rd(ins[5]))
        X2 = (rd(ins[6]), rd(ins[7]))
        Y2 = (rd(ins[8]), rd(ins[9]))
        Z2 = (rd(ins[10]), rd(ins[11]))
        shape = X1[0][0].shape
        b3 = (
            [jnp.full(shape, v, jnp.uint32) for v in b3c0],
            [jnp.full(shape, v, jnp.uint32) for v in b3c1],
        )

        t0 = f2mul(X1, X2)
        t1 = f2mul(Y1, Y2)
        t2 = f2mul(Z1, Z2)
        t3 = f2mul(f2add(X1, Y1), f2add(X2, Y2))
        t3 = f2sub(t3, f2add(t0, t1))
        t4 = f2mul(f2add(Y1, Z1), f2add(Y2, Z2))
        t4 = f2sub(t4, f2add(t1, t2))
        w_ = f2mul(f2add(X1, Z1), f2add(X2, Z2))
        Y3 = f2sub(w_, f2add(t0, t2))
        X3 = f2add(f2add(t0, t0), t0)
        t2b = f2mul(b3, t2)
        Z3 = f2add(t1, t2b)
        t1m = f2sub(t1, t2b)
        Y3b = f2mul(b3, Y3)
        X3r = f2sub(f2mul(t3, t1m), f2mul(t4, Y3b))
        Y3r = f2add(f2mul(Y3b, X3), f2mul(t1m, Z3))
        Z3r = f2add(f2mul(Z3, t4), f2mul(X3, t3))
        for comp, val in zip(outs, (X3r[0], X3r[1], Y3r[0], Y3r[1], Z3r[0], Z3r[1])):
            for k in range(n):
                comp[k] = val[k]

    def call(*flat):
        spec = pl.BlockSpec((n, S_TILE, LANE), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
        shapes = tuple(
            jax.ShapeDtypeStruct((n, S, LANE), np.uint32) for _ in range(6)
        )
        return pl.pallas_call(
            kernel,
            grid=(S // S_TILE,),
            out_shape=shapes,
            in_specs=[spec] * 12,
            out_specs=(spec,) * 6,
            interpret=interpret,
        )(*flat)

    return jax.jit(call)


def pallas_g2_add(P, Q, interpret: bool = False):
    """Fused complete G2 add.  P, Q: projective tuples of Fp2 coords,
    each coord a pair of (B, 24) uint32 Montgomery limb arrays."""
    import jax.numpy as jnp

    from ..fields.limbs import fp_field

    F = fp_field("jax")
    n = F.n
    comps = []
    for coord in (*P, *Q):
        comps.extend([coord[0], coord[1]])
    shape = np.broadcast_shapes(*[tuple(c.shape) for c in comps])
    B = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    tile = SUBLANE * LANE
    pad = (-B) % tile
    flat = []
    for c in comps:
        cf = jnp.broadcast_to(c, shape).reshape(B, n)
        if pad:
            cf = jnp.concatenate([cf, jnp.zeros((pad, n), jnp.uint32)], axis=0)
        flat.append(_to_limb_major(cf, n, (B + pad) // LANE))
    S = (B + pad) // LANE
    outs = _g2_add_call(S, interpret)(*flat)
    o = [_from_limb_major(x, n, B).reshape(shape) for x in outs]
    return ((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))


def _to_limb_major(x, n, S):
    return x.T.reshape(n, S, LANE)


def _from_limb_major(xT, n, B):
    return xT.reshape(n, -1).T[:B]


def pallas_g1_add(P, Q, interpret: bool = False):
    """Fused complete G1 add.  P, Q: projective tuples of (B, 24) uint32
    Montgomery limb arrays (broadcast-compatible); returns same."""
    import jax.numpy as jnp

    from ..fields.limbs import fp_field

    F = fp_field("jax")
    n = F.n
    coords = []
    # broadcast all six coordinates to a common batch shape
    shape = np.broadcast_shapes(*[tuple(c.shape) for c in (*P, *Q)])
    for c in (*P, *Q):
        coords.append(jnp.broadcast_to(c, shape))
    B = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    tile = SUBLANE * LANE
    pad = (-B) % tile
    flat = []
    for c in coords:
        cf = c.reshape(B, n)
        if pad:
            cf = jnp.concatenate([cf, jnp.zeros((pad, n), jnp.uint32)], axis=0)
        flat.append(_to_limb_major(cf, n, (B + pad) // LANE))
    S = (B + pad) // LANE
    ox, oy, oz = _g1_add_call(S, interpret)(*flat)
    out = tuple(
        _from_limb_major(o, n, B).reshape(shape) for o in (ox, oy, oz)
    )
    return out

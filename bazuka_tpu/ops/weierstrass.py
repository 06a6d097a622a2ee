"""Branchless short-Weierstrass point kernels for BLS12-381 G1/G2 on TPU.

Uses the COMPLETE projective addition law for a = 0 curves
(Renes–Costello–Batina 2015, algorithm 7): one fixed 12-multiply formula
that is correct for every input pair — doubling, identity, inverses —
so batched curve adds are pure vectorized field ops with no data-dependent
control flow (the TPU requirement; SURVEY.md §7 hard-part #2).

Field-generic: `FpOps` runs over Fp (24x16-bit limbs), `Fp2Ops` over
Fp2 = Fp[u]/(u^2+1) as coordinate pairs, so the same curve code serves
G1 and G2 (b = 4 resp. 4(u+1)).  Points are (X, Y, Z) projective tuples
of field elements; identity is (0, 1, 0).

Oracle: `bazuka_tpu.crypto.bls12_381` (host).
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.limbs import LimbField, fp_field


class FpOps:
    """Field adapter over Fp limbs.  Elements: (B, 24) uint32 Montgomery."""

    def __init__(self, backend: str):
        self.F = fp_field(backend)
        self.xp = self.F.xp
        self.backend = backend

    def add(self, a, b):
        return self.F.add(a, b)

    def sub(self, a, b):
        return self.F.sub(a, b)

    def mul(self, a, b):
        return self.F.mont_mul(a, b)

    def neg(self, a):
        return self.F.neg(a)

    def zero(self, shape=()):
        return self.F.zeros(shape)

    def one(self, shape=()):
        return self.F.ones_mont(shape) + self.xp.zeros(tuple(shape) + (self.F.n,), np.uint32)

    def const(self, x):
        """Host int -> Montgomery constant, shape (n,)."""
        return self.F.const_mont(x)

    def is_zero(self, a):
        return self.F.is_zero(a)

    def eq(self, a, b):
        return self.F.eq(a, b)

    def select(self, cond, a, b):
        return self.F.select(cond, a, b)

    def encode(self, ints):
        return self.xp.asarray(self.F.encode(np.array(ints, dtype=object)))

    def decode(self, a):
        return self.F.decode(np.asarray(a))

    def stack(self, elems):
        """Stack field elements along a new leading axis (for batching
        several independent multiplies into ONE mont_mul call — compile
        time scales with HLO count, so fusing k muls into one stacked
        call is a ~k× compile-time win)."""
        return self.xp.stack(self.xp.broadcast_arrays(*elems), axis=0)

    def unstack(self, a, k: int):
        return [a[i] for i in range(k)]

    def bcast(self, e, like):
        """Broadcast a constant field element to another element's shape."""
        return self.xp.broadcast_to(e, like.shape)


class Fp2Ops:
    """Field adapter over Fp2: elements are (c0, c1) pairs of Fp limb
    tensors; Karatsuba multiply on top of the limb engine."""

    def __init__(self, backend: str):
        self.F = fp_field(backend)
        self.xp = self.F.xp
        self.backend = backend

    def add(self, a, b):
        return (self.F.add(a[0], b[0]), self.F.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.F.sub(a[0], b[0]), self.F.sub(a[1], b[1]))

    def mul(self, a, b):
        # Karatsuba with the 3 Fp muls fused into one stacked mont_mul
        F = self.F
        xp = self.xp
        lhs = xp.stack(xp.broadcast_arrays(a[0], a[1], F.add(a[0], a[1])), axis=0)
        rhs = xp.stack(xp.broadcast_arrays(b[0], b[1], F.add(b[0], b[1])), axis=0)
        t = F.mont_mul(lhs, rhs)
        t0, t1, t2 = t[0], t[1], t[2]
        return (F.sub(t0, t1), F.sub(F.sub(t2, t0), t1))

    def neg(self, a):
        return (self.F.neg(a[0]), self.F.neg(a[1]))

    def zero(self, shape=()):
        return (self.F.zeros(shape), self.F.zeros(shape))

    def one(self, shape=()):
        z = self.F.zeros(shape)
        return (self.F.ones_mont(shape) + self.xp.zeros_like(z), z)

    def const(self, x):
        """(c0, c1) host ints -> Montgomery constants."""
        return (self.F.const_mont(x[0]), self.F.const_mont(x[1]))

    def is_zero(self, a):
        return self.xp.logical_and(self.F.is_zero(a[0]), self.F.is_zero(a[1]))

    def eq(self, a, b):
        return self.xp.logical_and(self.F.eq(a[0], b[0]), self.F.eq(a[1], b[1]))

    def select(self, cond, a, b):
        return (self.F.select(cond, a[0], b[0]), self.F.select(cond, a[1], b[1]))

    def encode(self, pairs):
        c0 = self.xp.asarray(self.F.encode(np.array([p[0] for p in pairs], dtype=object)))
        c1 = self.xp.asarray(self.F.encode(np.array([p[1] for p in pairs], dtype=object)))
        return (c0, c1)

    def decode(self, a):
        return list(zip(self.F.decode(np.asarray(a[0])), self.F.decode(np.asarray(a[1]))))

    def stack(self, elems):
        c0 = self.xp.stack(self.xp.broadcast_arrays(*[e[0] for e in elems]), axis=0)
        c1 = self.xp.stack(self.xp.broadcast_arrays(*[e[1] for e in elems]), axis=0)
        return (c0, c1)

    def unstack(self, a, k: int):
        return [(a[0][i], a[1][i]) for i in range(k)]

    def bcast(self, e, like):
        return (
            self.xp.broadcast_to(e[0], like[0].shape),
            self.xp.broadcast_to(e[1], like[1].shape),
        )


@functools.cache
def fp_ops(backend: str = "jax") -> FpOps:
    return FpOps(backend)


@functools.cache
def fp2_ops(backend: str = "jax") -> Fp2Ops:
    return Fp2Ops(backend)


# ---------------------------------------------------------------- curve


def proj_identity(K, shape=()):
    return (K.zero(shape), K.one(shape), K.zero(shape))


def _pallas_add_ok(K, P, Q) -> bool:
    """Route curve adds through the fused Pallas kernels on TPU when the
    batch is large (the jnp path's add/sub chains are HBM-bound)."""
    if K.backend != "jax" or getattr(K.F, "use_pallas", "never") == "never":
        return False
    import numpy as _np

    coords = []
    for c in (*P, *Q):
        coords.extend(c) if isinstance(c, tuple) else coords.append(c)
    shape = _np.broadcast_shapes(*[tuple(c.shape) for c in coords])
    batch = 1
    for d in shape[:-1]:
        batch *= d
    if batch < K.F._PALLAS_MIN_BATCH:
        return False
    if K.F.use_pallas == "always":
        return True
    import jax

    return jax.default_backend() == "tpu"


def proj_add(K, P, Q, b3):
    """Complete addition, RCB15 algorithm 7 (a = 0), b3 = 3*b as a field
    constant.  12 field muls grouped by dependency level into 3 stacked
    mont_mul calls (compile-time: one mul body instead of twelve);
    handles all edge cases branch-free.  Large G1 batches on TPU take the
    fused Pallas kernel instead (ops.pallas_curve)."""
    if _pallas_add_ok(K, P, Q):
        if isinstance(K, FpOps):
            from .pallas_curve import pallas_g1_add

            return pallas_g1_add(P, Q)
        from .pallas_curve import pallas_g2_add

        return pallas_g2_add(P, Q)
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    # level 1: all products of the inputs
    lhs = K.stack([X1, Y1, Z1, K.add(X1, Y1), K.add(Y1, Z1), K.add(X1, Z1)])
    rhs = K.stack([X2, Y2, Z2, K.add(X2, Y2), K.add(Y2, Z2), K.add(X2, Z2)])
    t0, t1, t2, u, v, w = K.unstack(K.mul(lhs, rhs), 6)
    t3 = K.sub(u, K.add(t0, t1))
    t4 = K.sub(v, K.add(t1, t2))
    Y3 = K.sub(w, K.add(t0, t2))
    X3 = K.add(K.add(t0, t0), t0)  # 3*X1*X2
    # level 2: the two b3 scalings
    t2b, Y3b = K.unstack(
        K.mul(K.stack([t2, Y3]), K.stack([K.bcast(b3, t2), K.bcast(b3, Y3)])), 2
    )
    Z3 = K.add(t1, t2b)
    t1m = K.sub(t1, t2b)
    # level 3: the six output products
    p = K.mul(
        K.stack([t3, t4, Y3b, t1m, Z3, X3]),
        K.stack([t1m, Y3b, X3, Z3, t4, t3]),
    )
    p1, p2, p3, p4, p5, p6 = K.unstack(p, 6)
    return (K.sub(p1, p2), K.add(p3, p4), K.add(p5, p6))


def proj_double(K, P, b3):
    return proj_add(K, P, P, b3)


def proj_select(K, cond, P, Q):
    return tuple(K.select(cond, p, q) for p, q in zip(P, Q))


def proj_is_identity(K, P):
    return K.is_zero(P[2])


def proj_eq(K, P, Q):
    """Projective equality X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1, with identity
    handled (both Z zero)."""
    both_id = K.xp.logical_and(proj_is_identity(K, P), proj_is_identity(K, Q))
    cross = K.xp.logical_and(
        K.eq(K.mul(P[0], Q[2]), K.mul(Q[0], P[2])),
        K.eq(K.mul(P[1], Q[2]), K.mul(Q[1], P[2])),
    )
    neither = K.xp.logical_and(
        ~proj_is_identity(K, P), ~proj_is_identity(K, Q)
    )
    return K.xp.logical_or(both_id, K.xp.logical_and(neither, cross))


def _scalar_bit(scalars, i):
    """Bit i of standard-form 16-bit-limb scalars (batch shape out)."""
    return ((scalars[..., i // 16] >> (i % 16)) & 1) != 0


def proj_scalar_mul(K, P, scalars, b3, nbits: int = 255):
    """Branchless double-and-add: fixed nbits iterations.
    scalars: (B, 16) standard-form Fr limbs."""
    from ..fields.limbs import fr_field

    assert scalars.shape[-1] == fr_field("np").n
    acc = proj_identity(K, scalars.shape[:-1])

    def body(j, acc):
        i = nbits - 1 - j
        acc = proj_double(K, acc, b3)
        added = proj_add(K, acc, P, b3)
        return proj_select(K, _scalar_bit(scalars, i), added, acc)

    return K.F._fori(0, nbits, body, acc)


@functools.cache
def _fermat_inv_fn(backend: str):
    """Vectorized Fp inversion x -> x^(p-2) (0 -> 0) over (N, 24)
    Montgomery limbs: left-to-right square-and-multiply as a lax.scan
    over the 381 static exponent bits — fully batched, ~570 Montgomery
    muls total, used for one-shot projective->affine conversion of MSM
    query arrays (a mixed add saves 3 of 14 muls EVERY accumulation
    round, so paying the inversion once per keygen wins)."""
    from ..fields.limbs import fp_field

    F = fp_field(backend)
    e = F.p - 2
    bits = np.array([int(b) for b in bin(e)[2:]], dtype=bool)

    def inv(z):
        import jax
        import jax.numpy as jnp

        one = F.const_mont(1)
        acc = jnp.broadcast_to(one[None, :], z.shape)

        def body(acc, bit):
            acc = F.mont_mul(acc, acc)
            withz = F.mont_mul(acc, z)
            return jnp.where(bit, withz, acc), None

        acc, _ = jax.lax.scan(body, acc, jnp.asarray(bits))
        return acc

    if backend == "jax":
        import jax

        inv = jax.jit(inv)
    return inv


def g1_proj_to_am(P, backend: str = "jax"):
    """Projective (X, Y, Z) (N, 24) Montgomery limbs -> point-major
    AFFINE ((N, 2, 24) limbs, (N,) uint32 infinity mask) — the v2 MSM
    query layout (ops.pallas_msm).  One batched Fermat inversion."""
    from ..fields.limbs import fp_field

    F = fp_field(backend)
    xp = F.xp
    X, Y, Z = P
    zinv = _fermat_inv_fn(backend)(Z)
    x = F.mont_mul(X, zinv)
    y = F.mont_mul(Y, zinv)
    inf = (Z == 0).all(axis=-1).astype(xp.uint32)
    return xp.stack([x, y], axis=1), inf


def g2_proj_to_am(P, backend: str = "jax"):
    """Projective G2 ((X0,X1),(Y0,Y1),(Z0,Z1)) (N, 24) Montgomery limbs
    -> point-major AFFINE ((N, 4, 24), (N,) inf mask).  Fp2 inversion
    via ONE Fp Fermat inversion of the norm:
    (z0 + z1·i)^-1 = (z0 − z1·i) / (z0² + z1²)."""
    from ..fields.limbs import fp_field

    F = fp_field(backend)
    xp = F.xp
    (X0, X1), (Y0, Y1), (Z0, Z1) = P
    norm = F.add(F.mont_mul(Z0, Z0), F.mont_mul(Z1, Z1))
    ninv = _fermat_inv_fn(backend)(norm)
    zi0 = F.mont_mul(Z0, ninv)
    zi1 = F.mont_mul(F.neg(Z1), ninv)

    # Fp2 multiply (X0 + X1 i)(zi0 + zi1 i)
    def f2mul(a0, a1, b0, b1):
        t0 = F.mont_mul(a0, b0)
        t1 = F.mont_mul(a1, b1)
        t2 = F.mont_mul(F.add(a0, a1), F.add(b0, b1))
        return F.sub(t0, t1), F.sub(F.sub(t2, t0), t1)

    x0, x1 = f2mul(X0, X1, zi0, zi1)
    y0, y1 = f2mul(Y0, Y1, zi0, zi1)
    inf = ((Z0 == 0).all(axis=-1) & (Z1 == 0).all(axis=-1)).astype(xp.uint32)
    return xp.stack([x0, x1, y0, y1], axis=1), inf


# host-side conversion helpers


def g1_to_proj(K: FpOps, pts):
    """List of host affine G1 points ((x, y) or None) -> projective limbs."""
    xs = [p[0] if p else 0 for p in pts]
    ys = [p[1] if p else 1 for p in pts]
    zs = [0 if p is None else 1 for p in pts]
    from ..fields.host import FP_MODULUS

    X = K.encode(xs)
    Y = K.encode(ys)
    Z = K.encode(zs)
    return (X, Y, Z)


def g1_from_proj(K_np: FpOps, P):
    """Projective numpy limbs -> list of host affine points / None."""
    from ..fields.host import FP

    xs = K_np.decode(P[0])
    ys = K_np.decode(P[1])
    zs = K_np.decode(P[2])
    out = []
    for x, y, z in zip(np.atleast_1d(xs), np.atleast_1d(ys), np.atleast_1d(zs)):
        if int(z) == 0:
            out.append(None)
        else:
            zi = FP.inv(int(z))
            out.append((int(x) * zi % FP.p, int(y) * zi % FP.p))
    return out


def g2_to_proj(K: Fp2Ops, pts):
    """List of host affine G2 points (((x0,x1),(y0,y1)) or None) -> projective."""
    xs = [p[0] if p else (0, 0) for p in pts]
    ys = [p[1] if p else (1, 0) for p in pts]
    zs = [(0, 0) if p is None else (1, 0) for p in pts]
    return (K.encode(xs), K.encode(ys), K.encode(zs))


def g2_from_proj(K_np: Fp2Ops, P):
    from ..fields import tower as tw

    xs = K_np.decode(P[0])
    ys = K_np.decode(P[1])
    zs = K_np.decode(P[2])
    out = []
    for x, y, z in zip(xs, ys, zs):
        x = (int(x[0]), int(x[1]))
        y = (int(y[0]), int(y[1]))
        z = (int(z[0]), int(z[1]))
        if z == (0, 0):
            out.append(None)
        else:
            zi = tw.fp2_inv(z)
            out.append((tw.fp2_mul(x, zi), tw.fp2_mul(y, zi)))
    return out


# curve constants (b3 = 3*b)

G1_B3 = 12
G2_B3 = (12, 12)  # 3 * 4(u+1) = 12 + 12u


@functools.cache
def g1_b3(backend: str):
    return fp_ops(backend).const(G1_B3)


@functools.cache
def g2_b3(backend: str):
    return fp2_ops(backend).const(G2_B3)


def warmup(backend: str):
    """Materialize cached device constants outside any jit trace."""
    g1_b3(backend)
    g2_b3(backend)


# ---------------------------------------------------------------- fixed base


@functools.cache
def _gen_powers_host(kind: str):
    """Host table [2^i * GEN for i in 0..254] (affine)."""
    from ..crypto import bls12_381 as bls

    pts = []
    p = bls.G1_GEN if kind == "g1" else bls.G2_GEN
    dbl = bls.g1_double if kind == "g1" else (lambda q: bls.g2_add(q, q))
    for _ in range(255):
        pts.append(p)
        p = dbl(p)
    return pts


@functools.cache
def gen_powers(kind: str, backend: str):
    """Device table of generator powers as projective limbs (255 lanes)."""
    pts = _gen_powers_host(kind)
    if kind == "g1":
        return g1_to_proj(fp_ops(backend), pts)
    return g2_to_proj(fp2_ops(backend), pts)


GEN_WINDOW_C = 8  # fixed-base window bits: 32 table adds per scalar


def _table_cache_path(kind: str) -> str:
    import os

    d = os.path.join(os.path.expanduser("~/.cache"), "bazuka_tpu_tables")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"genwin_{kind}_c{GEN_WINDOW_C}.npz")


@functools.cache
def _gen_window_table(kind: str, backend: str):
    """Projective table T[w*256 + d] = d * 2^(8w) * GEN for the windowed
    fixed-base multiply: built on device from the generator-power table
    with 8 conditional-add passes over all 32*256 lanes (complete adds,
    so the d=0 identity lanes are free).

    The table is a protocol constant (generator multiples), so it is
    persisted to disk after the first build — executing the build costs
    minutes per process on the XLA-CPU backend (test suites pay it in
    every process otherwise)."""
    import os

    import jax

    warmup(backend)
    path = _table_cache_path(kind)
    if os.path.exists(path):
        K0 = fp_ops(backend) if kind == "g1" else fp2_ops(backend)
        z = np.load(path)
        xp = K0.xp
        if kind == "g1":
            return tuple(xp.asarray(z[f"c{i}"]) for i in range(3))
        return tuple(
            (xp.asarray(z[f"c{i}0"]), xp.asarray(z[f"c{i}1"]))
            for i in range(3)
        )
    K = fp_ops(backend) if kind == "g1" else fp2_ops(backend)
    b3 = g1_b3(backend) if kind == "g1" else g2_b3(backend)
    powers = gen_powers(kind, backend)
    c = GEN_WINDOW_C
    n_windows = (255 + c - 1) // c
    lanes = n_windows << c
    digits = np.arange(lanes) & ((1 << c) - 1)
    wins = np.arange(lanes) >> c

    # per-pass gather tables, stacked so the build loop has ONE traced
    # add body (compile time scales with HLO count)
    bit_set_all = np.stack([(digits >> i) & 1 == 1 for i in range(c)])
    # bit 255 never occurs in Fr scalars (< 2^255): the clamped
    # top-window entries for digits >= 128 are unreachable
    pt_idx_all = np.stack([np.minimum(wins * c + i, 254) for i in range(c)])

    def build():
        bits_d = K.xp.asarray(bit_set_all)
        idx_d = K.xp.asarray(pt_idx_all)

        def body(i, acc):
            pt_idx = idx_d[i]
            pts = tuple(
                (coord[0][pt_idx], coord[1][pt_idx])
                if isinstance(coord, tuple)
                else coord[pt_idx]
                for coord in powers
            )
            return proj_select(K, bits_d[i], proj_add(K, acc, pts, b3), acc)

        return K.F._fori(0, c, body, proj_identity(K, (lanes,)))

    if backend == "jax":
        build = jax.jit(build)
    out = build()
    if backend == "jax":
        jax.block_until_ready(out[0] if not isinstance(out[0], tuple) else out[0][0])
    try:  # persist (best-effort; see docstring)
        if kind == "g1":
            np.savez(path, **{f"c{i}": np.asarray(out[i]) for i in range(3)})
        else:
            np.savez(
                path,
                **{
                    f"c{i}{s}": np.asarray(out[i][s])
                    for i in range(3)
                    for s in range(2)
                },
            )
    except OSError:
        pass
    return out


@functools.cache
def _batch_gen_mul_fn(kind: str, backend: str):
    warmup(backend)
    K = fp_ops(backend) if kind == "g1" else fp2_ops(backend)
    b3 = g1_b3(backend) if kind == "g1" else g2_b3(backend)
    tbl = _gen_window_table(kind, backend)
    c = GEN_WINDOW_C
    n_windows = (255 + c - 1) // c

    def run(scalars):
        """(B, 16) standard-form Fr limbs -> (B,) projective s*GEN:
        32 windowed table-gather adds per scalar (8x fewer curve ops than
        the 255-round double-and-add; the keygen workhorse).  The window
        loop is a fori_loop over a precomputed digit matrix — ONE traced
        add body, not 32 inlined copies."""
        per_limb = 16 // c
        digits = K.xp.stack(
            [
                (
                    (scalars[..., w // per_limb] >> ((w % per_limb) * c))
                    & ((1 << c) - 1)
                ).astype(K.xp.int32)
                + (w << c)
                for w in range(n_windows)
            ]
        )

        def body(w, acc):
            idx = digits[w]
            pts = tuple(
                (coord[0][idx], coord[1][idx])
                if isinstance(coord, tuple)
                else coord[idx]
                for coord in tbl
            )
            return proj_add(K, acc, pts, b3)

        return K.F._fori(0, n_windows, body, proj_identity(K, scalars.shape[:-1]))

    if backend == "jax":
        import jax

        run = jax.jit(run)
    return run


def batch_gen_mul(scalars, kind: str = "g1", backend: str = "jax"):
    """Batched fixed-base multiply s_i * GEN (keygen workhorse)."""
    return _batch_gen_mul_fn(kind, backend)(scalars)


def batch_gen_mul_host(scalars, kind: str = "g1", backend: str = "jax"):
    """Host ints in -> host affine points out."""
    from ..fields.limbs import fr_field

    Fr = fr_field(backend)
    s = Fr.xp.asarray(Fr.encode(np.array(list(scalars), dtype=object), mont=False))
    R = batch_gen_mul(s, kind, backend)
    if kind == "g1":
        return g1_from_proj(fp_ops("np"), tuple(np.asarray(c) for c in R))
    return g2_from_proj(
        fp2_ops("np"), tuple(tuple(np.asarray(x) for x in c) for c in R)
    )

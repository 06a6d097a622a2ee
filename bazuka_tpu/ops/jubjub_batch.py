"""Batched JubJub curve kernels for TPU.

TPU-first design: extended twisted-Edwards coordinates (X, Y, Z, T) with
a = -1 give a COMPLETE, branch-free addition law (Hisil et al. "add-2008-hwcd-3"),
so scalar multiplication is a fixed 255-step fori_loop of vectorized field
ops with per-lane bit selects — no data-dependent control flow, everything
rides the 8x128 VPU.  This replaces the reference's branchy affine/projective
arithmetic (reference: src/crypto/jubjub/curve.rs:19-144) with a uniform
kernel; results are bit-exact vs the host curve (`bazuka_tpu.crypto.jubjub`).

Layout: a batch of points is a tuple of four (B, 16) uint32 limb tensors in
Montgomery form.  Scalars for mul are STANDARD-form (B, 16) limb tensors
(bits are extracted per 16-bit limb).
"""

from __future__ import annotations

import functools

import numpy as np

from ..crypto import jubjub as jj
from ..fields.limbs import LimbField, fr_field


@functools.cache
def _consts(backend: str):
    # NOTE: caches device constants — must be warmed OUTSIDE any jit trace
    # (a constant first materialized during tracing is a tracer and would
    # leak through this cache).  Public entry points call warmup() first.
    F = fr_field(backend)
    return {
        "k": F.const_mont(2 * jj.D % jj.P),  # k = 2d
        "two": F.const_mont(2),
    }


def warmup(backend: str):
    """Materialize all cached device constants outside any trace."""
    _consts(backend)
    _base_powers(backend)


def identity(F: LimbField, shape=()):
    """Extended identity (0, 1, 1, 0)."""
    z = F.zeros(shape)
    o = F.ones_mont(shape) + F.xp.zeros_like(z)  # materialize broadcast
    return (z, o, o, F.zeros(shape))


def to_extended(F: LimbField, x, y):
    """Affine Montgomery limbs -> extended (X, Y, Z, T)."""
    one = F.ones_mont(x.shape[:-1]) + F.xp.zeros_like(x)
    return (x, y, one, F.mont_mul(x, y))


def to_affine_host(F_np: LimbField, P):
    """Extended numpy point(s) -> affine ints (host-side, batch inversion-free)."""
    X, Y, Z, _ = (np.asarray(c) for c in P)
    xs = F_np.decode(X)
    ys = F_np.decode(Y)
    zs = F_np.decode(Z)
    from ..fields.host import FR

    def conv(x, y, z):
        if z == 0:
            return (0, 1)
        zi = FR.inv(z)
        return (x * zi % jj.P, y * zi % jj.P)

    if np.ndim(xs) == 0:
        return conv(int(xs), int(ys), int(zs))
    out = np.empty(xs.shape, dtype=object)
    for idx in np.ndindex(xs.shape):
        out[idx] = conv(int(xs[idx]), int(ys[idx]), int(zs[idx]))
    return out


def ext_add(F: LimbField, P, Q, k=None):
    """Complete extended addition (add-2008-hwcd-3): 9 mont_muls grouped
    into 3 stacked calls (compile-time win; see weierstrass.proj_add).
    Handles P == Q, P == -Q and identities with no branches."""
    if k is None:
        k = _consts(F.backend)["k"]
    xp = F.xp
    X1, Y1, Z1, T1 = P
    X2, Y2, Z2, T2 = Q
    lhs = xp.stack(xp.broadcast_arrays(F.sub(Y1, X1), F.add(Y1, X1), T1, Z1), axis=0)
    rhs = xp.stack(xp.broadcast_arrays(F.sub(Y2, X2), F.add(Y2, X2), T2, Z2), axis=0)
    m = F.mont_mul(lhs, rhs)
    a, b, t1t2, z1z2 = m[0], m[1], m[2], m[3]
    c = F.mont_mul(k, t1t2)
    d = F.double(z1z2)
    e = F.sub(b, a)
    f = F.sub(d, c)
    g = F.add(d, c)
    h = F.add(b, a)
    out = F.mont_mul(
        xp.stack(xp.broadcast_arrays(e, g, f, e), axis=0),
        xp.stack(xp.broadcast_arrays(f, h, g, h), axis=0),
    )
    return (out[0], out[1], out[2], out[3])


def ext_double(F: LimbField, P):
    """Doubling via the complete add (sufficient; a dedicated dbl-2008-hwcd
    saves 1 mul if this ever shows in profiles)."""
    return ext_add(F, P, P)


def ext_select(F: LimbField, cond, P, Q):
    """Per-lane select: cond ? P : Q.  cond shape = batch shape."""
    return tuple(F.select(cond, p, q) for p, q in zip(P, Q))


def ext_eq(F: LimbField, P, Q):
    """Projective equality: X1*Z2 == X2*Z1 and Y1*Z2 == Y2*Z1."""
    X1, Y1, Z1, _ = P
    X2, Y2, Z2, _ = Q
    return F.xp.logical_and(
        F.eq(F.mont_mul(X1, Z2), F.mont_mul(X2, Z1)),
        F.eq(F.mont_mul(Y1, Z2), F.mont_mul(Y2, Z1)),
    )


def _scalar_bit(F: LimbField, scalars, i):
    """Bit i of standard-form 16-bit-limb scalars; shape = batch."""
    limb = scalars[..., i // 16]
    return ((limb >> (i % 16)) & 1) != 0


def batch_scalar_mul(F: LimbField, points, scalars):
    """Variable-base double-and-add: 255 fixed iterations, branchless.

    points: extended tuple of (B, 16) Montgomery limbs
    scalars: (B, 16) standard-form limbs
    """
    ident = identity(F, scalars.shape[:-1])

    def body(j, acc):
        i = 254 - j
        acc = ext_double(F, acc)
        added = ext_add(F, acc, points)
        return ext_select(F, _scalar_bit(F, scalars, i), added, acc)

    return F._fori(0, 255, body, ident)


@functools.cache
def _base_powers_np():
    Fn = fr_field("np")
    pts = []
    p = jj.BASE
    for _ in range(255):
        pts.append(p)
        p = jj.point_double(p)
    xs = Fn.encode(np.array([p[0] for p in pts], dtype=object))
    ys = Fn.encode(np.array([p[1] for p in pts], dtype=object))
    ts = Fn.mont_mul(xs, ys)
    ones = np.broadcast_to(Fn.one_mont_limbs, xs.shape).copy()
    return (xs, ys, ones, ts)


@functools.cache
def _base_powers(backend: str):
    """Host-precomputed table 2^i * B for i in 0..254, Montgomery affine,
    shape (255, 16) per coordinate — turns fixed-base mul into 255
    conditional adds (no doublings).  Computed in numpy so nothing traced
    ever leaks into this cache."""
    F = fr_field(backend)
    return tuple(F.xp.asarray(c) for c in _base_powers_np())


def batch_base_mul(F: LimbField, scalars):
    """Fixed-base scalar mul s*B via the precomputed power table."""
    tbl = _base_powers(F.backend)

    def body(i, acc):
        pt_i = tuple(c[i][None] for c in tbl)  # (1, 16) broadcasts over batch
        added = ext_add(F, acc, pt_i)
        return ext_select(F, _scalar_bit(F, scalars, i), added, acc)

    return F._fori(0, 255, body, identity(F, scalars.shape[:-1]))


# ---------------------------------------------------------------- EdDSA


@functools.cache
def _verify_fn(backend: str):
    F = fr_field(backend)
    warmup(backend)
    from .poseidon import _hash_fn

    poseidon6 = _hash_fn(6, backend)

    def run(pk_x, pk_y, msg, r_x, r_y, s_std):
        """All args (B, 16) limbs; pk/r/msg Montgomery, s standard form.
        Returns (B,) bool: s*B == R + h*A."""
        h_m = poseidon6(
            F.xp.stack([r_x, r_y, pk_x, pk_y, msg], axis=1)
        )  # (B, 16) Montgomery
        h_std = F.from_mont(h_m)
        sb = batch_base_mul(F, s_std)
        ha = batch_scalar_mul(F, to_extended(F, pk_x, pk_y), h_std)
        rhs = ext_add(F, ha, to_extended(F, r_x, r_y))
        return ext_eq(F, sb, rhs)

    if backend == "jax":
        import jax

        run = jax.jit(run)
    return run


def batch_eddsa_verify(pks, msgs, sigs, backend: str = "jax") -> np.ndarray:
    """Verify a batch of Poseidon-EdDSA signatures on TPU.

    pks: list of decompressed (x, y) int pairs; msgs: list of ints;
    sigs: list of crypto.jubjub.Signature.  Returns (B,) bool.
    On-curve checks for pk/R are host-side (cheap, per reference
    src/crypto/jubjub/mod.rs:152-168 semantics).
    """
    F = fr_field(backend)
    ok_curve = np.array(
        [jj.is_on_curve(pk) and jj.is_on_curve(sig.r) for pk, sig in zip(pks, sigs)]
    )
    enc = lambda vals: F.xp.asarray(F.encode(np.array(vals, dtype=object)))
    pk_x = enc([p[0] for p in pks])
    pk_y = enc([p[1] for p in pks])
    msg = enc(list(msgs))
    r_x = enc([s.r[0] for s in sigs])
    r_y = enc([s.r[1] for s in sigs])
    s_std = F.xp.asarray(
        F.encode(np.array([s.s for s in sigs], dtype=object), mont=False)
    )
    ok = np.asarray(_verify_fn(backend)(pk_x, pk_y, msg, r_x, r_y, s_std))
    return ok & ok_curve

"""JubJub curve + EdDSA tests (model: reference
src/crypto/jubjub/curve.rs:166-198 and mod.rs:170-194), plus bit-exactness
of the batched TPU kernels vs the host curve."""

import numpy as np
import pytest

from bazuka_tpu.crypto import jubjub as jj
from bazuka_tpu.fields.limbs import fr_field
from bazuka_tpu.ops import jubjub_batch as jb


def test_curve_laws():
    # ((2G)+G)+G == 2(2G) == G+G+G+G  (reference curve.rs:166-189)
    a = jj.point_add(jj.point_add(jj.point_double(jj.BASE), jj.BASE), jj.BASE)
    b = jj.point_double(jj.point_double(jj.BASE))
    c = jj.BASE
    for _ in range(3):
        c = jj.point_add(c, jj.BASE)
    assert a == b == c
    assert jj.is_on_curve(a)
    assert jj.is_on_curve(jj.BASE)


def test_scalar_mul_matches_naive():
    acc = jj.ZERO
    for k in range(1, 20):
        acc = jj.point_add(acc, jj.BASE)
        assert jj.point_mul(jj.BASE, k) == acc
    assert jj.point_mul(jj.BASE, 0) == jj.ZERO
    # order * G == identity (subgroup order)
    assert jj.point_mul(jj.BASE_COFACTOR, jj.ORDER) == jj.ZERO


def test_compression_roundtrip():
    p1 = jj.point_mul(jj.BASE, 123)
    assert jj.decompress(jj.compress(p1)) == p1
    pk = jj.PublicKey(*jj.compress(p1))
    s = str(pk)
    assert s.startswith("jub")
    assert jj.PublicKey.parse(s) == pk
    with pytest.raises(ValueError):
        jj.PublicKey.parse("jub4" + "00" * 32)
    with pytest.raises(ValueError):
        jj.PublicKey.parse("zzz")


def test_eddsa_sign_verify():
    pk, sk = jj.JubJub.generate_keys(b"ABC")
    sig = jj.JubJub.sign(sk, 123456)
    assert jj.JubJub.verify(pk, 123456, sig)
    assert not jj.JubJub.verify(pk, 123457, sig)
    pk2, _ = jj.JubJub.generate_keys(b"XYZ")
    assert not jj.JubJub.verify(pk2, 123456, sig)


# ---------------------------------------------------------------- TPU kernels


@pytest.mark.parametrize("backend", ["np", "jax"])
def test_ext_add_matches_host(backend):
    F = fr_field(backend)
    rng = np.random.default_rng(1)
    ks = [int(k) for k in rng.integers(1, 2**62, size=6)]
    pts = [jj.point_mul(jj.BASE, k) for k in ks]
    enc = lambda vals: F.xp.asarray(F.encode(np.array(vals, dtype=object)))
    P = jb.to_extended(F, enc([p[0] for p in pts[:3]]), enc([p[1] for p in pts[:3]]))
    Q = jb.to_extended(F, enc([p[0] for p in pts[3:]]), enc([p[1] for p in pts[3:]]))
    R = jb.ext_add(F, P, Q)
    got = jb.to_affine_host(fr_field("np"), R)
    want = [jj.point_add(pts[i], pts[3 + i]) for i in range(3)]
    assert list(got) == want


@pytest.mark.parametrize("backend", ["np"])
def test_ext_add_edge_cases(backend):
    F = fr_field(backend)
    enc = lambda vals: F.xp.asarray(F.encode(np.array(vals, dtype=object)))
    g = jj.BASE
    neg_g = jj.point_neg(g)
    # P+P (doubling), P+(-P) (identity), P+0, 0+0 — complete formula, no branches
    P = jb.to_extended(F, enc([g[0], g[0], g[0], 0]), enc([g[1], g[1], g[1], 1]))
    Q = jb.to_extended(
        F, enc([g[0], neg_g[0], 0, 0]), enc([g[1], neg_g[1], 1, 1])
    )
    got = list(jb.to_affine_host(fr_field("np"), jb.ext_add(F, P, Q)))
    assert got == [jj.point_double(g), jj.ZERO, g, jj.ZERO]


def test_batch_scalar_mul_and_base_mul():
    F = fr_field("np")
    rng = np.random.default_rng(2)
    scalars = [int(s) for s in rng.integers(0, 2**63, size=4)] + [0, 1, jj.ORDER]
    enc_std = F.xp.asarray(F.encode(np.array(scalars, dtype=object), mont=False))
    # fixed-base
    got = list(jb.to_affine_host(F, jb.batch_base_mul(F, enc_std)))
    want = [jj.point_mul(jj.BASE, s) for s in scalars]
    assert got == want
    # variable-base (use 7G as the base)
    base7 = jj.point_mul(jj.BASE, 7)
    enc = lambda vals: F.xp.asarray(F.encode(np.array(vals, dtype=object)))
    B = len(scalars)
    pts = jb.to_extended(F, enc([base7[0]] * B), enc([base7[1]] * B))
    got2 = list(jb.to_affine_host(F, jb.batch_scalar_mul(F, pts, enc_std)))
    want2 = [jj.point_mul(base7, s) for s in scalars]
    assert got2 == want2


@pytest.mark.parametrize("backend", ["np", "jax"])
def test_batch_eddsa_verify(backend):
    sigs, pks, msgs = [], [], []
    for i in range(4):
        pk, sk = jj.JubJub.generate_keys(bytes([i]))
        sig = jj.JubJub.sign(sk, 1000 + i)
        pks.append(pk.decompress())
        msgs.append(1000 + i)
        sigs.append(sig)
    # tamper with the last message
    msgs[-1] = 9999
    ok = jb.batch_eddsa_verify(pks, msgs, sigs, backend)
    assert list(ok) == [True, True, True, False]

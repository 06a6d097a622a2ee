"""Limb-engine correctness vs Python-int ground truth.

Mirrors the reference's `ff` semantics for Fr (reference: src/zk/mod.rs:202-206)
and exercises every primitive the downstream kernels rely on.  Exhaustive
checks run on the numpy twin of the engine; a JAX-parity test asserts the
jitted path produces identical limbs (the two share one code path).
"""

import random

import numpy as np
import pytest

from bazuka_tpu.fields.host import FP, FR, FP_MODULUS, FR_MODULUS
from bazuka_tpu.fields.limbs import (
    LimbField,
    fp_field,
    fr_field,
    int_to_limbs,
    limbs_to_int,
)

rng = random.Random(0xBA2)


@pytest.fixture(scope="module", params=["fr", "fp"])
def field(request):
    if request.param == "fr":
        return fr_field("np"), FR
    return fp_field("np"), FP


def rand_elems(p, k):
    return [rng.randrange(p) for _ in range(k)]


def test_limb_roundtrip():
    for _ in range(20):
        x = rng.randrange(1 << 256)
        assert limbs_to_int(int_to_limbs(x, 16)) == x


def test_encode_decode(field):
    F, H = field
    xs = rand_elems(F.p, 17)
    dec = F.decode(F.encode(xs))
    assert [int(v) for v in dec] == xs


def test_add_sub_neg(field):
    F, H = field
    a = rand_elems(F.p, 33)
    b = rand_elems(F.p, 33)
    ea, eb = F.encode(a), F.encode(b)
    assert list(F.decode(F.add(ea, eb))) == [H.add(x, y) for x, y in zip(a, b)]
    assert list(F.decode(F.sub(ea, eb))) == [H.sub(x, y) for x, y in zip(a, b)]
    assert list(F.decode(F.neg(ea))) == [H.neg(x) for x in a]


def test_mul(field):
    F, H = field
    edge = [0, 1, 2, F.p - 1, F.p - 2, F.R_mod_p, (1 << 255) % F.p]
    a = edge + rand_elems(F.p, 40)
    b = list(reversed(edge)) + rand_elems(F.p, 40)
    ea, eb = F.encode(a), F.encode(b)
    assert list(F.decode(F.mont_mul(ea, eb))) == [H.mul(x, y) for x, y in zip(a, b)]
    assert list(F.decode(F.mont_sqr(ea))) == [H.sqr(x) for x in a]


def test_inv_pow(field):
    F, H = field
    a = rand_elems(F.p, 9) + [1, F.p - 1]
    ea = F.encode(a)
    assert list(F.decode(F.inv_mont(ea))) == [H.inv(x) for x in a]
    e = 0xDEADBEEFCAFEBABE
    assert list(F.decode(F.pow_mont(ea, e))) == [H.pow(x, e) for x in a]


def test_predicates(field):
    F, _ = field
    a = F.encode([0, 1, 5, 0])
    assert list(np.asarray(F.is_zero(a))) == [True, False, False, True]
    b = F.encode([0, 1, 6, 1])
    assert list(np.asarray(F.eq(a, b))) == [True, True, False, False]


def test_to_from_mont(field):
    F, _ = field
    xs = rand_elems(F.p, 8)
    raw = F.encode(xs, mont=False)
    m = F.to_mont(raw)
    back = F.from_mont(m)
    assert list(F.decode(back, mont=False)) == xs


def test_small_modulus_exhaustive():
    """Tiny-modulus cross-check under the Mersenne prime 2^17 - 1."""
    p = 131071
    F = LimbField(p, 3, "tiny", backend="np")
    xs = list(range(0, p, 641)) + [0, 1, p - 1]
    ea = F.encode(xs)
    for shift, op, ref in [
        (1, F.add, lambda x, y: (x + y) % p),
        (3, F.sub, lambda x, y: (x - y) % p),
        (5, F.mont_mul, lambda x, y: (x * y) % p),
    ]:
        ys = xs[shift:] + xs[:shift]
        got = list(F.decode(op(ea, F.encode(ys))))
        assert got == [ref(x, y) for x, y in zip(xs, ys)]


def test_jax_matches_numpy():
    """The jitted JAX path must produce bit-identical limbs to the numpy twin."""
    import jax

    Fj = fr_field("jax")
    Fn = fr_field("np")
    xs = rand_elems(FR_MODULUS, 8)
    ys = rand_elems(FR_MODULUS, 8)
    a_np, b_np = np.asarray(Fn.encode(xs)), np.asarray(Fn.encode(ys))
    a_j, b_j = Fj.xp.asarray(a_np), Fj.xp.asarray(b_np)

    @jax.jit
    def all_ops(a, b):
        return (
            Fj.add(a, b),
            Fj.sub(a, b),
            Fj.mont_mul(a, b),
            Fj.neg(a),
            Fj.mont_sqr(a),
        )

    got = all_ops(a_j, b_j)
    want = (
        Fn.add(a_np, b_np),
        Fn.sub(a_np, b_np),
        Fn.mont_mul(a_np, b_np),
        Fn.neg(a_np),
        Fn.mont_sqr(a_np),
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_moduli_constants():
    assert FR_MODULUS.bit_length() == 255
    assert FP_MODULUS.bit_length() == 381
    # 2-adicity of Fr (NTT friendliness)
    assert (FR_MODULUS - 1) % (1 << 32) == 0

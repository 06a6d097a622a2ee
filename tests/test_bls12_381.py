"""BLS12-381 curve + pairing tests: group laws, subgroup order,
pairing bilinearity and non-degeneracy."""

from bazuka_tpu.crypto import bls12_381 as bls
from bazuka_tpu.fields import tower as tw


def test_generators_on_curve():
    assert bls.g1_is_on_curve(bls.G1_GEN)
    assert bls.g2_is_on_curve(bls.G2_GEN)


def test_g1_group_law():
    g = bls.G1_GEN
    assert bls.g1_add(bls.g1_double(g), g) == bls.g1_mul(g, 3)
    assert bls.g1_add(g, bls.g1_neg(g)) is None
    assert bls.g1_mul(g, bls.R) is None  # subgroup order
    assert bls.g1_is_on_curve(bls.g1_mul(g, 123456789))


def test_g2_group_law():
    g = bls.G2_GEN
    assert bls.g2_add(bls.g2_add(g, g), g) == bls.g2_mul(g, 3)
    assert bls.g2_add(g, bls.g2_neg(g)) is None
    assert bls.g2_mul(g, bls.R) is None
    assert bls.g2_is_on_curve(bls.g2_mul(g, 987654321))


def test_tower_inverses():
    a2 = (123456789, 987654321)
    assert tw.fp2_mul(a2, tw.fp2_inv(a2)) == tw.FP2_ONE
    a6 = (a2, (5, 6), (7, 8))
    assert tw.fp6_mul(a6, tw.fp6_inv(a6)) == tw.FP6_ONE
    a12 = (a6, ((9, 1), (2, 3), (4, 5)))
    assert tw.fp12_mul(a12, tw.fp12_inv(a12)) == tw.FP12_ONE
    # w^2 == v and tower consistency
    assert tw.fp12_mul(tw.W, tw.W) == tw.W2
    assert tw.fp12_mul(tw.W2, tw.W) == tw.W3


def test_pairing_bilinearity():
    e = bls.pairing(bls.G2_GEN, bls.G1_GEN)
    assert e != tw.FP12_ONE  # non-degenerate
    # e(aP, Q) == e(P, Q)^a == e(P, aQ)
    a, b = 5, 7
    e_ab = bls.pairing(bls.g2_mul(bls.G2_GEN, b), bls.g1_mul(bls.G1_GEN, a))
    assert e_ab == tw.fp12_pow(e, a * b)
    # r-th root of unity
    assert tw.fp12_pow(e, bls.R) == tw.FP12_ONE


def test_multi_pairing_cancellation():
    # e(aG1, G2) * e(-G1, aG2) == 1
    a = 11
    out = bls.multi_pairing(
        [
            (bls.g1_mul(bls.G1_GEN, a), bls.G2_GEN),
            (bls.g1_neg(bls.G1_GEN), bls.g2_mul(bls.G2_GEN, a)),
        ]
    )
    assert out == tw.FP12_ONE

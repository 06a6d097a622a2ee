"""Circuit gadget tests: witness evaluation + constraint satisfaction
(model: reference gadgets/*/test.rs, checked here via satisfiability
rather than full proving — the slow prove/verify path covers that)."""

import pytest

from bazuka_tpu.crypto import jubjub as jj
from bazuka_tpu.fields.host import FR_MODULUS
from bazuka_tpu.groth16.gadgets import (
    AllocatedPoint,
    Bool,
    Num,
    UnsignedInteger,
    base_mul,
    calc_root_poseidon4,
    check_proof_poseidon4,
    mux,
    poseidon,
    reveal,
    verify_eddsa,
)
from bazuka_tpu.groth16.r1cs import ConstraintSystem
from bazuka_tpu.zk.poseidon_host import PoseidonHasher
from bazuka_tpu.zk.state import SCALAR, ListModel, Struct, ZkStateBuilder, compress_state

P = FR_MODULUS


def satisfied(cs):
    return cs.is_satisfied() is None


def test_num_arithmetic_and_is_zero():
    cs = ConstraintSystem()
    a = Num.alloc(cs, 7)
    b = Num.alloc(cs, 5)
    c = a.mul(cs, b)
    assert c.value == 35
    z = (c - Num.constant(35)).is_zero(cs)
    assert z.value is True
    nz = a.is_zero(cs)
    assert nz.value is False
    assert satisfied(cs)
    # violated equality is caught
    cs2 = ConstraintSystem()
    x = Num.alloc(cs2, 3)
    x.assert_equal(cs2, Num.constant(4))
    assert not satisfied(cs2)


def test_bool_and_mux():
    cs = ConstraintSystem()
    t = Bool.alloc(cs, True)
    f = Bool.alloc(cs, False)
    assert t.and_(cs, f).value is False
    assert t.or_(cs, f).value is True
    assert f.not_().value is True
    a, b = Num.alloc(cs, 11), Num.alloc(cs, 22)
    assert mux(cs, t, a, b).value == 22  # select ? b : a
    assert mux(cs, f, a, b).value == 11
    assert satisfied(cs)


def test_uint_comparisons():
    cs = ConstraintSystem()
    a = UnsignedInteger.alloc_64(cs, 100)
    b = UnsignedInteger.alloc_64(cs, 200)
    assert a.lt(cs, b).value is True
    assert a.gt(cs, b).value is False
    assert a.lte(cs, b).value is True
    c = UnsignedInteger.alloc_64(cs, 100)
    assert a.lt(cs, c).value is False
    assert a.lte(cs, c).value is True
    assert a.gte(cs, c).value is True
    assert satisfied(cs)


def test_uint_constrain_strict():
    cs = ConstraintSystem()
    UnsignedInteger.constrain_strict(cs, Num.alloc(cs, P - 1))
    UnsignedInteger.constrain_strict(cs, Num.alloc(cs, 0))
    UnsignedInteger.constrain_strict(cs, Num.alloc(cs, 12345))
    assert satisfied(cs)


def test_poseidon_gadget_matches_native():
    for arity in (1, 2, 4, 5, 7):
        cs = ConstraintSystem()
        vals = list(range(10, 10 + arity))
        nums = [Num.alloc(cs, v) for v in vals]
        out = poseidon(cs, nums)
        assert out.value == PoseidonHasher.hash(vals)
        assert satisfied(cs)


def test_merkle_gadget_matches_state_tree():
    b = ZkStateBuilder(ListModel(2, SCALAR))
    for i, v in [(3, 100), (7, 200), (12, 300)]:
        b.batch_set({(i,): v})
    root = b.compress().state_hash
    for index, value in [(3, 100), (7, 200), (0, 0)]:
        proof = b.prove((), index)
        cs = ConstraintSystem()
        idx = UnsignedInteger.alloc(cs, index, 4)
        val = Num.alloc(cs, value)
        proof_nums = [[Num.alloc(cs, s) for s in level] for level in proof]
        got = calc_root_poseidon4(cs, idx, val, proof_nums)
        assert got.value == root
        check_proof_poseidon4(
            cs, Bool.alloc(cs, True), idx, val, proof_nums, Num.alloc(cs, root)
        )
        assert satisfied(cs)
    # wrong value breaks the enabled check
    cs = ConstraintSystem()
    idx = UnsignedInteger.alloc(cs, 3, 4)
    val = Num.alloc(cs, 999)
    proof_nums = [[Num.alloc(cs, s) for s in level] for level in b.prove((), 3)]
    check_proof_poseidon4(
        cs, Bool.alloc(cs, True), idx, val, proof_nums, Num.alloc(cs, root)
    )
    assert not satisfied(cs)
    # ... but passes when disabled (null-padding path)
    cs = ConstraintSystem()
    idx = UnsignedInteger.alloc(cs, 3, 4)
    val = Num.alloc(cs, 999)
    proof_nums = [[Num.alloc(cs, s) for s in level] for level in b.prove((), 3)]
    check_proof_poseidon4(
        cs, Bool.alloc(cs, False), idx, val, proof_nums, Num.alloc(cs, root)
    )
    assert satisfied(cs)


def test_point_ops_match_host():
    cs = ConstraintSystem()
    g = jj.BASE
    g2 = jj.point_mul(g, 2)
    p = AllocatedPoint.alloc(cs, g)
    q = AllocatedPoint.alloc(cs, g2)
    s = p.add(cs, q)
    assert s.value() == jj.point_mul(g, 3)
    s2 = p.add_const(cs, g2)
    assert s2.value() == jj.point_mul(g, 3)
    p.assert_on_curve(cs, Bool.alloc(cs, True))
    assert satisfied(cs)
    # scalar mul
    cs = ConstraintSystem()
    p = AllocatedPoint.alloc(cs, g)
    k = Num.alloc(cs, 23)
    out = p.mul(cs, k)
    assert out.value() == jj.point_mul(g, 23)
    bm = base_mul(cs, g, Num.alloc(cs, 23))
    assert bm.value() == jj.point_mul(g, 23)
    assert satisfied(cs)


def test_eddsa_gadget():
    pk, sk = jj.JubJub.generate_keys(b"gadget")
    msg = 424242
    sig = jj.JubJub.sign(sk, msg)
    cs = ConstraintSystem()
    pkp = AllocatedPoint.alloc(cs, pk.decompress())
    r = AllocatedPoint.alloc(cs, sig.r)
    verify_eddsa(
        cs, Bool.alloc(cs, True), pkp, Num.alloc(cs, msg), r, Num.alloc(cs, sig.s)
    )
    assert satisfied(cs)
    # wrong message fails (reference: eddsa/test.rs:72-94 reject path)
    cs = ConstraintSystem()
    pkp = AllocatedPoint.alloc(cs, pk.decompress())
    r = AllocatedPoint.alloc(cs, sig.r)
    verify_eddsa(
        cs, Bool.alloc(cs, True), pkp, Num.alloc(cs, msg + 1), r, Num.alloc(cs, sig.s)
    )
    assert not satisfied(cs)
    # disabled check passes even with garbage
    cs = ConstraintSystem()
    pkp = AllocatedPoint.alloc(cs, pk.decompress())
    r = AllocatedPoint.alloc(cs, sig.r)
    verify_eddsa(
        cs, Bool.alloc(cs, False), pkp, Num.alloc(cs, msg + 1), r, Num.alloc(cs, sig.s)
    )
    assert satisfied(cs)


def test_reveal_matches_compress():
    model = Struct([SCALAR, ListModel(1, SCALAR)])
    data = {(0,): 5, (1, 0): 7, (1, 2): 9}
    want = compress_state(model, data).state_hash
    cs = ConstraintSystem()
    state = [
        Num.alloc(cs, 5),
        [Num.alloc(cs, 7), Num.alloc(cs, 0), Num.alloc(cs, 9), Num.alloc(cs, 0)],
    ]
    got = reveal(cs, model, state)
    assert got.value == want
    assert satisfied(cs)

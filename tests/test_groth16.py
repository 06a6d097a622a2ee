"""End-to-end Groth16: R1CS -> keygen -> prove (TPU NTT/MSM) -> verify
(host pairing).  Model: the reference's per-gadget prove/verify tests
(reference: src/zk/groth16/gadgets/*/test.rs) — accept AND reject paths.

Tier budget: the default tier keeps ONE ungated real prove/verify
roundtrip but loads a COMMITTED deterministic proving key
(tests/data/toy_multiply_params.npz, seed b"test") instead of running
keygen — on this host the XLA:CPU persistent cache never hits, and the
toy keygen alone cost ~7 min of every default run (round-5 tier work).
Keygen itself is covered in the slow tier, which regenerates the key
and checks it matches the committed bytes (mirroring how the reference
pins ceremony keys: src/config/blockchain.rs:31-38)."""

import os

import pytest

from bazuka_tpu.fields.host import FR_MODULUS

# Full prove/verify on CPU takes minutes (full-width MSMs at toy lane
# counts are dispatch-bound); gate behind BAZUKA_SLOW_TESTS.
slow = pytest.mark.skipif(
    not os.environ.get("BAZUKA_SLOW_TESTS"),
    reason="set BAZUKA_SLOW_TESTS=1 to run full prove/verify on CPU",
)
from bazuka_tpu.groth16.keygen import (
    generate_parameters,
    load_parameters,
    save_parameters,
)
from bazuka_tpu.groth16.prove import create_proof
from bazuka_tpu.groth16.r1cs import ONE, ConstraintSystem, lc
from bazuka_tpu.groth16.verify import groth16_verify

P = FR_MODULUS

PINNED = os.path.join(os.path.dirname(__file__), "data",
                      "toy_multiply_params.npz")


def multiply_circuit(x=None, y=None, proving=True):
    """Public input z, witness x, y with x*y = z and x + y = sum (2 constraints)."""
    cs = ConstraintSystem(proving=proving)
    z = (x * y % P) if proving else None
    z_var = cs.alloc_input(z)
    x_var = cs.alloc(x)
    y_var = cs.alloc(y)
    cs.enforce(lc((x_var, 1)), lc((y_var, 1)), lc((z_var, 1)))
    # a second, linear constraint: (x + y) * 1 = s
    s_var = cs.alloc((x + y) % P if proving else None)
    cs.enforce(lc((x_var, 1), (y_var, 1)), lc((ONE, 1)), lc((s_var, 1)))
    return cs, z


@pytest.fixture(scope="module")
def params():
    return load_parameters(PINNED)


def test_cs_satisfaction():
    cs, _ = multiply_circuit(3, 5)
    assert cs.is_satisfied() is None
    bad = ConstraintSystem()
    v = bad.alloc(2)
    bad.enforce(lc((v, 1)), lc((v, 1)), lc((ONE, 5)))  # 2*2 != 5
    assert bad.is_satisfied() == 0


def test_prove_verify_roundtrip(params):
    """Default-on real Groth16 roundtrip: pinned key -> prove ->
    pairing-verify on a tiny circuit, exercising the full sparse-matvec
    + NTT + MSM prover pipeline every CI run — then prove AGAIN in
    BIG_DOMAIN mode (serialized stages + half-width parked tensors, the
    d=2^24 mainnet path, forced at toy size via the module threshold),
    which must produce the identical accepting proof at pinned
    randomness.  One compiled-program set serves both proves."""
    import bazuka_tpu.groth16.prove as prove_mod

    cs, z = multiply_circuit(3, 5)
    proof = create_proof(params, cs, r=7, s=11)
    assert groth16_verify(params.vk, [z], proof)
    # wrong public input rejects
    assert not groth16_verify(params.vk, [z + 1], proof)
    # wrong input count rejects
    assert not groth16_verify(params.vk, [z, 0], proof)

    old = prove_mod.BIG_DOMAIN
    try:
        prove_mod.BIG_DOMAIN = 1
        big_proof = prove_mod.create_proof(params, cs, r=7, s=11)
    finally:
        prove_mod.BIG_DOMAIN = old
    assert (big_proof.a, big_proof.b, big_proof.c) == (
        proof.a, proof.b, proof.c
    ), "big-mode prover must be bit-identical at pinned randomness"


@slow
def test_pinned_params_match_keygen():
    """The committed toy key is exactly what deterministic keygen
    produces (seed b"test") — the slow-tier guard that keeps the pinned
    fixture honest."""
    import numpy as np

    from bazuka_tpu.utils import ser

    def vk_bytes(vk):
        w = ser.Writer()
        vk.write_to(w)
        return w.bytes()

    cs, _ = multiply_circuit(3, 5)
    fresh = generate_parameters(cs, seed=b"test")
    pinned = load_parameters(PINNED)
    assert vk_bytes(fresh.vk) == vk_bytes(pinned.vk)
    for name in ("a_query", "b_g1_query", "l_query", "h_query",
                 "b_g2_query"):
        fa, fi = getattr(fresh.pk, name)
        pa, pi = getattr(pinned.pk, name)
        assert (np.asarray(fa, np.uint32) == np.asarray(pa, np.uint32)).all()
        assert (np.asarray(fi, np.uint32) == np.asarray(pi, np.uint32)).all()


@slow
def test_proof_is_randomized_but_both_verify(params):
    cs, z = multiply_circuit(4, 6)
    p1 = create_proof(params, cs, r=1, s=2)
    p2 = create_proof(params, cs, r=3, s=4)
    assert p1.a != p2.a
    assert groth16_verify(params.vk, [z], p1)
    assert groth16_verify(params.vk, [z], p2)


@slow
def test_tampered_proof_rejects(params):
    cs, z = multiply_circuit(2, 9)
    proof = create_proof(params, cs, r=5, s=6)
    from bazuka_tpu.zk.proof import G1Wire

    bad = G1Wire((proof.a.x + 1) % (2**381), proof.a.y, proof.a.infinity)
    tampered = type(proof)(a=bad, b=proof.b, c=proof.c)
    assert not groth16_verify(params.vk, [z], tampered)


@slow
def test_unsatisfied_witness_fails_to_verify(params):
    # craft an assignment violating x*y = z; proof must not verify
    cs = ConstraintSystem()
    z_var = cs.alloc_input(999)  # wrong product
    x_var = cs.alloc(3)
    y_var = cs.alloc(5)
    cs.enforce(lc((x_var, 1)), lc((y_var, 1)), lc((z_var, 1)))
    s_var = cs.alloc(8)
    cs.enforce(lc((x_var, 1), (y_var, 1)), lc((ONE, 1)), lc((s_var, 1)))
    assert cs.is_satisfied() == 0
    proof = create_proof(params, cs, r=7, s=11)
    assert not groth16_verify(params.vk, [999], proof)

"""End-to-end Groth16: R1CS -> keygen -> prove (TPU NTT/MSM) -> verify
(host pairing).  Model: the reference's per-gadget prove/verify tests
(reference: src/zk/groth16/gadgets/*/test.rs) — accept AND reject paths."""

import os

import pytest

from bazuka_tpu.fields.host import FR_MODULUS

# Full prove/verify on CPU takes minutes (full-width MSMs at toy lane
# counts are dispatch-bound); gate behind BAZUKA_SLOW_TESTS.
slow = pytest.mark.skipif(
    not os.environ.get("BAZUKA_SLOW_TESTS"),
    reason="set BAZUKA_SLOW_TESTS=1 to run full prove/verify on CPU",
)
from bazuka_tpu.groth16.keygen import generate_parameters
from bazuka_tpu.groth16.prove import create_proof
from bazuka_tpu.groth16.r1cs import ONE, ConstraintSystem, lc
from bazuka_tpu.groth16.verify import groth16_verify

P = FR_MODULUS


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
    cs, _ = multiply_circuit(3, 5)
    return generate_parameters(cs, seed=b"test")


def test_cs_satisfaction():
    cs, _ = multiply_circuit(3, 5)
    assert cs.is_satisfied() is None
    bad = ConstraintSystem()
    v = bad.alloc(2)
    bad.enforce(lc((v, 1)), lc((v, 1)), lc((ONE, 5)))  # 2*2 != 5
    assert bad.is_satisfied() == 0


def test_prove_verify_roundtrip(params):
    """Default-on real Groth16 roundtrip (VERDICT item 4): keygen ->
    prove -> pairing-verify on a tiny circuit, exercising the full
    sparse-matvec + NTT + MSM prover pipeline every CI run."""
    cs, z = multiply_circuit(3, 5)
    proof = create_proof(params, cs, r=7, s=11)
    assert groth16_verify(params.vk, [z], proof)
    # wrong public input rejects
    assert not groth16_verify(params.vk, [z + 1], proof)
    # wrong input count rejects
    assert not groth16_verify(params.vk, [z, 0], proof)


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


def test_big_mode_prove_verify():
    """BIG_DOMAIN mode (serialized stages + half-width parked tensors,
    the d=2^24 mainnet path) must produce the same accepting proofs as
    normal mode.  Forced at toy size via the module threshold."""
    import bazuka_tpu.groth16.prove as prove_mod
    from bazuka_tpu.groth16.verify import groth16_verify

    cs, z = multiply_circuit(3, 5)
    params = generate_parameters(cs, seed=b"big-mode")
    old = prove_mod.BIG_DOMAIN
    try:
        prove_mod.BIG_DOMAIN = 1
        proof = prove_mod.create_proof(params, cs, r=7, s=11)
    finally:
        prove_mod.BIG_DOMAIN = old
    assert groth16_verify(params.vk, [z], proof)
    assert not groth16_verify(params.vk, [(z + 1) % P], proof)

"""Mesh-parallel Groth16 prover on the 8-virtual-device CPU mesh
(parallel.prove): the production v3 drain sharded over point ranges +
four-step all_to_all h phase, end-to-end against the host verifier.

Model: the reference's per-gadget prove/verify tests
(reference: src/zk/groth16/gadgets/*/test.rs) run accept AND reject
paths on real proofs; here the prover under test is the sharded one."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile/execution-heavy device kernels

from bazuka_tpu.crypto import bls12_381 as bls
from bazuka_tpu.fields.host import FR_MODULUS
from bazuka_tpu.groth16.keygen import generate_parameters
from bazuka_tpu.groth16.r1cs import ONE, ConstraintSystem, lc
from bazuka_tpu.groth16.verify import groth16_verify
from bazuka_tpu.ops import pallas_msm as pm
from bazuka_tpu.ops.msm import _enc_scalars
from bazuka_tpu.parallel import make_mesh, msm_sharded_v3

P = FR_MODULUS


@pytest.fixture(scope="module")
def mesh():
    import jax

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _oracle_g1(pts, scalars):
    want = None
    for p, s in zip(pts, scalars):
        want = bls.g1_add(want, bls.g1_mul(p, s))
    return want


def test_msm_sharded_v3_matches_oracle(mesh):
    rng = np.random.default_rng(0)
    n, nbits = 1 << 7, 16
    ks = (np.arange(n) % 32) + 1
    pts = [bls.g1_mul(bls.G1_GEN, int(k)) for k in ks]
    scalars = [int(s) for s in rng.integers(1, 1 << nbits, size=n)]
    want = bls.g1_mul(
        bls.G1_GEN, sum(int(k) * s for k, s in zip(ks, scalars)) % bls.R
    )
    P_am, inf = pm.points_to_am(pts)
    got = msm_sharded_v3(
        mesh, (np.asarray(P_am), np.asarray(inf)),
        np.asarray(_enc_scalars(scalars, "jax")), c=4, nbits=nbits
    )
    assert got == want


def test_msm_sharded_v3_dedup_split(mesh):
    """Duplicate-heavy scalars through the host-gather presum + zeroed
    sharded main drain (the witness-vector path)."""
    n, nbits = 1 << 7, 16
    ks = (np.arange(n) % 32) + 1
    pts = [bls.g1_mul(bls.G1_GEN, int(k)) for k in ks]
    scalars = [1 if i % 3 else 7 for i in range(n)]
    want = _oracle_g1(pts, scalars)
    plan = pm.make_dedup_plan(
        np.asarray(_enc_scalars(scalars, "np")), threshold=8
    )
    assert plan.active
    P_am, inf = pm.points_to_am(pts)
    got = msm_sharded_v3(
        mesh, (np.asarray(P_am), np.asarray(inf)),
        np.asarray(_enc_scalars(scalars, "jax")), c=4, nbits=nbits,
        dedup_plan=plan,
    )
    assert got == want


def chain_circuit(x0=3, n_sq=40, n_dup=14, proving=True):
    """Squaring chain + duplicate-value wires: d = 64 (the smallest
    domain the 8-way four-step factorization accepts) and > threshold
    duplicates of 1 so the sharded dedup-split path runs in-proof."""
    cs = ConstraintSystem(proving=proving)
    cur = x0 % P
    x = cs.alloc(cur if proving else None)
    for _ in range(n_sq):
        cur = cur * cur % P
        v = cs.alloc(cur if proving else None)
        cs.enforce(lc((x, 1)), lc((x, 1)), lc((v, 1)))
        x = v
    z = cs.alloc_input(cur if proving else None)
    cs.enforce(lc((x, 1)), lc((ONE, 1)), lc((z, 1)))
    for _ in range(n_dup):
        v = cs.alloc(1 if proving else None)
        cs.enforce(lc((v, 1)), lc((ONE, 1)), lc((ONE, 1)))
    return cs, cur


def test_sharded_prove_verify_roundtrip(mesh):
    from bazuka_tpu.parallel import create_proof_sharded

    cs, z = chain_circuit()
    assert cs.is_satisfied() is None
    params = generate_parameters(cs, seed=b"sharded")
    proof = create_proof_sharded(params, cs, mesh, r=7, s=11)
    assert groth16_verify(params.vk, [z], proof)
    assert not groth16_verify(params.vk, [(z + 1) % P], proof)
    # the sharded prover is bit-identical to the single-chip one at
    # pinned randomness: same math, same wire bytes
    from bazuka_tpu.groth16.prove import create_proof

    single = create_proof(params, cs, r=7, s=11)
    assert (single.a, single.b, single.c) == (proof.a, proof.b, proof.c)

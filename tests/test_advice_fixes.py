"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. dummy proofs reject on non-test chains; mainnet config carries the
   REAL reference ceremony VKs (decoded from the bincode wire format)
2. withdraw fees credit the update executor
3. VRF outputs must be prime-order (torsion-shifted outputs reject)
4. mint aux_data/executor-fee/overflow semantics match mint.rs
5. Groth16 proof points must pass subgroup checks
"""

import pytest

from bazuka_tpu.blockchain import KvStoreChain
from bazuka_tpu.blockchain import error as E
from bazuka_tpu.config.blockchain import get_test_blockchain_config, load_mainnet_vks
from bazuka_tpu.core.transaction import ContractId, ContractWithdraw, Money
from bazuka_tpu.crypto import bls12_381 as bls
from bazuka_tpu.crypto import jubjub as jj
from bazuka_tpu.crypto.vrf import VRF, Output
from bazuka_tpu.db import RamKvStore
from bazuka_tpu.wallet.tx_builder import TxBuilder
from bazuka_tpu.zk import proof as zkproof
from bazuka_tpu.zk.proof import ZkProof, ZkVerifierKey, check_proof
from bazuka_tpu.zk.wire import decode_vk, encode_vk, validate_vk_points


@pytest.fixture
def chain():
    conf = get_test_blockchain_config()
    return KvStoreChain(RamKvStore(), conf)


# ---------------------------------------------------------- 1: VKs / dummy


def test_mainnet_vks_decode_and_validate():
    """The reference's hardcoded ceremony VKs (src/config/blockchain.rs:31-38)
    parse through our wire codec, every point is on-curve and in the
    prime-order subgroup, and re-encoding is byte-identical."""
    import importlib.resources as res

    vks = load_mainnet_vks()
    assert set(vks) == {"deposit", "withdraw", "update"}
    data_dir = res.files("bazuka_tpu.zk") / "data"
    for name, zvk in vks.items():
        assert zvk.kind == "groth16"
        vk = zvk.vk
        assert len(vk.ic) == 6  # 5 public inputs + 1
        assert validate_vk_points(vk) is None
        raw = (data_dir / f"mpn_{name}_vk.bin").read_bytes()
        assert decode_vk(raw) == vk
        assert encode_vk(vk) == raw


def test_dummy_proof_rejected_unless_test_mode():
    saved = zkproof._ALLOW_DUMMY
    try:
        zkproof.allow_dummy_proofs(False)
        ok = check_proof(ZkVerifierKey.dummy(), 0, 0, 0, 0, 0, ZkProof.dummy(True))
        assert not ok, "dummy proof must not verify outside test mode"
        zkproof.allow_dummy_proofs(True)
        assert check_proof(ZkVerifierKey.dummy(), 0, 0, 0, 0, 0, ZkProof.dummy(True))
        assert not check_proof(
            ZkVerifierKey.dummy(), 0, 0, 0, 0, 0, ZkProof.dummy(False)
        )
    finally:
        zkproof.allow_dummy_proofs(saved)


# ---------------------------------------------------------- 2: withdraw fee


def test_withdraw_fee_credits_executor(chain):
    """Reference withdraw.rs:38 pushes withdraw.fee into executor_fees;
    burning it would break balance conservation."""
    cid = chain.config.mpn_config.mpn_contract_id
    user = TxBuilder(b"ABC")
    dep = user.deposit_mpn("", cid, user.get_mpn_address(), 1,
                           Money.ziesha(1000), Money.ziesha(0))
    chain.apply_deposit(dep.payment)

    wd = ContractWithdraw(
        memo="", contract_id=cid, withdraw_circuit_id=0, calldata=777,
        dst=user.get_address(), amount=Money.ziesha(200), fee=Money.ziesha(50),
    )
    contract = chain.get_contract(cid)
    fees = []
    chain._cu_withdraw(cid, contract, 0, [wd], fees)
    assert fees == [Money.ziesha(50)]
    # amount+fee left the contract, amount reached the user
    assert chain.get_contract_balance(cid, ContractId.ZIESHA) == 750
    assert chain.get_balance(user.get_address(), ContractId.ZIESHA) == 9200


# ---------------------------------------------------------- 3: VRF torsion


def test_vrf_rejects_torsion_shifted_output():
    """JubJub has cofactor 8; (0, -1) is the 2-torsion point.  For an even
    DLEQ challenge, out+T verifies identically to out under a verifier
    without subgroup checks — two valid outputs per slot.  We reject any
    non-prime-order output."""
    torsion = (0, jj.P - 1)
    assert jj.is_on_curve(torsion)
    assert jj.point_mul(torsion, jj.ORDER) != jj.ZERO  # ORDER is odd

    pk, sk = VRF.generate_keys(b"staker")
    # find a message whose challenge is even, so c*T vanishes and the
    # honest proof also fits the shifted output under the OLD verifier
    for i in range(64):
        msg = b"slot-%d" % i
        out, proof = VRF.sign(sk, msg)
        if proof.c % 2 == 0:
            break
    else:
        pytest.fail("no even challenge in 64 tries (p=2^-64)")
    assert VRF.verify(pk, msg, out, proof)
    shifted = Output(jj.point_add(out.point, torsion))
    assert shifted.point != out.point
    assert not VRF.verify(pk, msg, shifted, proof)


# ---------------------------------------------------------- 4: mint


def test_mint_semantics(chain):
    """aux_data = compressed Scalar state (root == amount, size 1);
    minted amount credits the executor; u64 overflow rejects
    (reference mint.rs:13-41)."""
    from bazuka_tpu.zk.proof import ZkSingleInputVerifierKey

    ziesha = ContractId.ZIESHA
    contract = chain.get_contract(ziesha)
    assert contract.token is not None
    contract.token.mint_functions.append(
        ZkSingleInputVerifierKey(ZkVerifierKey.dummy())
    )

    fees = []
    vk, aux = chain._cu_mint(ziesha, contract, 0, 123456, fees)
    assert aux.state_hash == 123456 and aux.state_size == 1
    assert fees == [Money(ziesha, 123456)]
    assert chain.get_contract_balance(ziesha, ziesha) == 123456
    assert chain.get_token(ziesha).supply == 2_000_000_000 * 10**9 + 123456

    # zero mint: empty scalar state
    fees2 = []
    _, aux0 = chain._cu_mint(ziesha, contract, 0, 0, fees2)
    assert aux0.state_hash == 0 and aux0.state_size == 0

    with pytest.raises(E.TokenSupplyOverflow):
        chain._cu_mint(ziesha, contract, 0, 2**64 - 1, [])


# ---------------------------------------------------------- 5: subgroup


def _random_g1_non_subgroup():
    """A point on y^2 = x^3 + 4 that is (whp) outside the prime-order
    subgroup: cofactor is ~2^125, so any hashed curve point qualifies."""
    p = bls.P
    x = 2
    while True:
        rhs = (x * x * x + 4) % p
        y = pow(rhs, (p + 1) // 4, p)
        if y * y % p == rhs:
            pt = (x, y)
            if not bls.g1_in_subgroup(pt):
                return pt
        x += 1


def test_g1_subgroup_check():
    assert bls.g1_in_subgroup(None)
    assert bls.g1_in_subgroup(bls.G1_GEN)
    assert bls.g1_in_subgroup(bls.g1_mul(bls.G1_GEN, 123457))
    bad = _random_g1_non_subgroup()
    assert bls.g1_is_on_curve(bad)
    assert not bls.g1_in_subgroup(bad)


def test_g2_subgroup_check():
    assert bls.g2_in_subgroup(None)
    assert bls.g2_in_subgroup(bls.G2_GEN)
    assert bls.g2_in_subgroup(bls.g2_mul(bls.G2_GEN, 999))


def test_groth16_verify_rejects_non_subgroup_a():
    """A proof whose A point is on-curve but outside the subgroup must be
    rejected before the pairing (malleability guard)."""
    from bazuka_tpu.groth16.verify import groth16_verify
    from bazuka_tpu.zk.proof import G1Wire, Groth16Proof

    vks = load_mainnet_vks()
    vk = vks["update"].vk
    bad = _random_g1_non_subgroup()
    proof = Groth16Proof(
        a=G1Wire(bad[0], bad[1], False),
        b=vk.beta_g2,
        c=vk.alpha_g1,
    )
    assert not groth16_verify(vk, [1, 2, 3, 4, 5], proof)

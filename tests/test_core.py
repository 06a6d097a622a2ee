"""Core datatypes + crypto tests: Merkle golden vectors (reference:
src/crypto/merkle.rs:111-162), ed25519, VRF, tx serialization/signing."""

import pytest

from bazuka_tpu.core import (
    Block,
    ContractId,
    Header,
    Money,
    MpnAddress,
    MpnTransaction,
    NonceGroup,
    GeneralTransaction,
    ProofOfStake,
    RegularSendEntry,
    Transaction,
    TransactionAndDelta,
    TransactionData,
)
from bazuka_tpu.core.hash import Sha3Hasher
from bazuka_tpu.core.money import Decimal, display_amount
from bazuka_tpu.crypto import jubjub as jj
from bazuka_tpu.crypto.ed25519 import Ed25519, PublicKey
from bazuka_tpu.crypto.merkle import MerkleTree, merge_hash
from bazuka_tpu.crypto.vrf import VRF
from bazuka_tpu.utils import ser


def H(i):
    return Sha3Hasher.hash(bytes([i]))


def test_merkle_golden_vectors():
    # reference: src/crypto/merkle.rs:130-161 (literal roots)
    assert MerkleTree([]).root() == bytes(32)
    assert MerkleTree([H(1)]).root() == bytes(
        [39, 103, 241, 92, 138, 242, 242, 199, 34, 93, 82, 115, 253, 214, 131,
         237, 199, 20, 17, 10, 152, 125, 16, 84, 105, 124, 52, 138, 237, 78,
         108, 199]
    )
    assert MerkleTree([H(2), H(3)]).root() == bytes(
        [147, 148, 62, 236, 12, 170, 57, 157, 174, 243, 124, 220, 81, 74, 187,
         99, 252, 243, 77, 85, 3, 93, 223, 166, 184, 93, 190, 149, 217, 73,
         107, 7]
    )
    assert MerkleTree([H(i) for i in range(10)]).root() == bytes(
        [170, 152, 247, 242, 8, 76, 139, 70, 132, 168, 19, 116, 29, 8, 9, 42,
         0, 85, 164, 237, 192, 106, 123, 174, 180, 217, 32, 126, 18, 38, 210,
         79]
    )
    assert MerkleTree([H(i) for i in range(16)]).root() == bytes(
        [205, 127, 119, 130, 101, 244, 191, 81, 239, 175, 89, 0, 91, 183, 65,
         61, 170, 6, 253, 155, 249, 90, 186, 20, 71, 105, 83, 24, 118, 68, 70,
         119]
    )


def test_merkle_proofs():
    tree = MerkleTree([H(i) for i in range(10)])
    for i in range(10):
        curr = H(i)
        for entry in tree.prove(i):
            curr = merge_hash(curr, entry)
        assert curr == tree.root()


def test_ed25519_roundtrip():
    pk, sk = Ed25519.generate_keys(b"ABC")
    sig = Ed25519.sign(sk, b"hello")
    assert Ed25519.verify(pk, b"hello", sig)
    assert not Ed25519.verify(pk, b"hell0", sig)
    s = str(pk)
    assert s.startswith("ed") and len(s) == 66
    assert PublicKey.parse(s) == pk
    with pytest.raises(ValueError):
        PublicKey.parse("xx" + "0" * 64)


def test_vrf():
    pk, sk = VRF.generate_keys(b"validator")
    out, proof = VRF.sign(sk, b"epoch-1-slot-3")
    assert VRF.verify(pk, b"epoch-1-slot-3", out, proof)
    assert not VRF.verify(pk, b"epoch-1-slot-4", out, proof)
    pk2, _ = VRF.generate_keys(b"other")
    assert not VRF.verify(pk2, b"epoch-1-slot-3", out, proof)
    assert 0.0 <= out.as_float() < 1.0
    # deterministic
    out2, _ = VRF.sign(sk, b"epoch-1-slot-3")
    assert out2.point == out.point


def test_money_display_parse():
    assert display_amount(123450000, 9) == "0.12345"
    assert display_amount(1_000_000_000, 9) == "1.0"
    assert display_amount(0, 9) == "0.0"
    assert Decimal.parse("1.5").to_amount(9) == 1_500_000_000
    assert Decimal.parse("2").to_amount(9) == 2_000_000_000
    with pytest.raises(ValueError):
        Decimal.parse(".")


def test_contract_id_display():
    assert str(ContractId.NULL) == "Null"
    assert str(ContractId.ZIESHA) == "Ziesha"
    c = ContractId(0x1234)
    assert ContractId.parse(str(c)) == c


def test_transaction_sign_serialize_roundtrip():
    pk, sk = Ed25519.generate_keys(b"alice")
    pk2, _ = Ed25519.generate_keys(b"bob")
    tx = Transaction(
        src=pk,
        nonce=1,
        data=TransactionData(
            "regular_send", entries=[RegularSendEntry(pk2, Money.ziesha(100))]
        ),
        fee=Money.ziesha(1),
        memo="hi",
    )
    assert not tx.verify_signature()
    tx.sign(sk)
    assert tx.verify_signature()
    blob = ser.dumps(tx)
    tx2 = ser.loads(Transaction, blob)
    assert tx2.verify_signature()
    assert tx2.hash() == tx.hash()
    # tampering breaks the signature
    tx2.nonce = 2
    assert not tx2.verify_signature()


def test_mpn_transaction_sign_and_nonce_group():
    src_pk, src_sk = jj.JubJub.generate_keys(b"l2src")
    dst_pk, _ = jj.JubJub.generate_keys(b"l2dst")
    mpn_tx = MpnTransaction(
        nonce=0, src_pub_key=src_pk, dst_pub_key=dst_pk,
        amount=Money.ziesha(10), fee=Money.ziesha(1),
    )
    mpn_tx.sign(src_sk)
    assert mpn_tx.verify_signature()
    g = GeneralTransaction(mpn_tx)
    assert g.nonce() == 0
    assert g.nonce_group() == NonceGroup("mpn_transaction", str(MpnAddress(src_pk)))
    blob = ser.dumps(mpn_tx)
    back = ser.loads(MpnTransaction, blob)
    assert back.verify_signature()


def test_block_merkle_and_header_roundtrip():
    pk, sk = Ed25519.generate_keys(b"v")
    tx = Transaction(
        src=None, nonce=0,
        data=TransactionData("regular_send", entries=[RegularSendEntry(pk, Money.ziesha(5))]),
        fee=Money.ziesha(0), memo="",
    )
    header = Header(
        parent_hash=bytes(32), number=0, block_root=bytes(32),
        proof_of_stake=ProofOfStake(validator=pk, timestamp=0),
    )
    block = Block(header=header, body=[tx])
    root = block.merkle_tree().root()
    assert root == MerkleTree([tx.hash()]).root()
    blob = ser.dumps(block)
    back = ser.loads(Block, blob)
    assert back.header.hash() == header.hash()
    assert back.body[0].hash() == tx.hash()

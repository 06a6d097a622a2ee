"""Mainnet genesis parity (VERDICT item 5).

The reference's launch state is protocol data: 3254 L1 balances + 211
L2 MPN accounts (src/config/initials.rs, extracted by
tools/extract_initials.py), the first staker and treasury delegation,
and the MPN contract whose initial state root commits the L2 accounts
(src/config/blockchain.rs:70-147, 230-315).  These tests pin the
resulting roots so any state-machine regression shows up as a genesis
mismatch."""

from bazuka_tpu.blockchain import KvStoreChain
from bazuka_tpu.config.blockchain import (
    get_blockchain_config,
    load_initial_balances,
    load_initial_mpn_balances,
)
from bazuka_tpu.core.transaction import ContractId
from bazuka_tpu.crypto.ed25519 import PublicKey as Address
from bazuka_tpu.db import RamKvStore

# the canonical MPN genesis root over the 211 initial L2 accounts
# (log4_tree=15 sparse quad-Merkle, Poseidon): computed by this
# implementation and pinned; 844 = 211 accounts x 4 nonzero leaves
MPN_GENESIS_ROOT = (
    5598568384144783990585920207595467297849593467222007634357028426684414928491
)
MPN_GENESIS_SIZE = 844

FIRST_STAKER = "ed744735b5239d32a5b5b6441474bf65a6aaa6bfcf8905d4616f1acc14cf3847f0"


def test_initials_data():
    l1 = load_initial_balances()
    l2 = load_initial_mpn_balances()
    assert len(l1) == 3254
    assert len(l2) == 211
    assert sum(a for _, a in l1) == 19664470
    assert sum(a for _, a in l2) == 2484681
    # first entries of the reference tables
    assert str(l1[0][0]) == "edf9f4952b0de27c3cd2202c31b7840a7081f6a3eafc898c8632a6b0d29a6c3177"
    assert l1[0][1] == 10000000
    assert str(l2[0][0]) == "jub220b276df9fcd7db35f292a3011e1ac423a5c5950eba64242d0fb8e4f2a8351f2"
    assert l2[0][1] == 296230


def test_mainnet_genesis_state():
    conf = get_blockchain_config()
    mpn_tx = conf.genesis.body[1]
    assert mpn_tx.data.contract.initial_state.state_hash == MPN_GENESIS_ROOT
    assert mpn_tx.data.contract.initial_state.state_size == MPN_GENESIS_SIZE

    chain = KvStoreChain(RamKvStore(), conf)
    assert chain.get_height() == 1
    cid = conf.mpn_config.mpn_contract_id
    # on-chain recomputed root matches the claimed compressed state
    acc = chain.get_contract_account(cid)
    assert acc.compressed_state.state_hash == MPN_GENESIS_ROOT
    # the contract holds the L2 sum; the first staker holds the treasury
    # delegation; an airdropped L1 account has its balance
    assert chain.get_contract_balance(cid, ContractId.ZIESHA) == 2484681
    assert chain.get_stake(Address.parse(FIRST_STAKER)) == 1_000_000_000_000
    l1 = load_initial_balances()
    assert chain.get_balance(l1[0][0], ContractId.ZIESHA) == l1[0][1]
    assert chain.get_balance(l1[-1][0], ContractId.ZIESHA) == l1[-1][1]
    # an initial L2 account is readable through the MPN account view
    from bazuka_tpu.core.address import MpnAddress

    l2 = load_initial_mpn_balances()
    mpn_acc = chain.get_mpn_account(l2[0][0])
    assert mpn_acc.tokens[0].token_id == ContractId.ZIESHA
    assert mpn_acc.tokens[0].amount == l2[0][1]
    assert mpn_acc.address == l2[0][0].pub_key.decompress()

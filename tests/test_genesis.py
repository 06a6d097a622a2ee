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
# (log4_tree=15 sparse quad-Merkle, Poseidon), independently re-derived
# by test_mpn_genesis_root_independent_derivation below with a
# straight-line walk of the reference's algorithm (no zk.state
# machinery); 844 = 211 accounts x 4 nonzero cells
MPN_GENESIS_ROOT = (
    5598568384144783990585920207595467297849593467222007634357028426684414928491
)
MPN_GENESIS_SIZE = 844

# full-genesis pins: any change to header layout, tx serialization, or
# the MPN contract payload shows up here
GENESIS_HEADER_HASH = (
    "fd179ffe7d0927ba463239228b1b3135ff525baf429d6e0ea2dab4014a8ae154"
)
MPN_TX_BYTES_SHA3 = (
    "7a51c523e914c4c939cf45b0f2420e10b30d8dbb752ad0c8ba834834a977f9e6"
)
MPN_TX_BYTES_LEN = 43419

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


def test_mpn_genesis_root_independent_derivation():
    """Independent straight-line recomputation of MPN_GENESIS_ROOT
    (VERDICT r2 missing #5: the pin alone only guards regressions).

    Re-implements the reference's genesis construction directly from its
    algorithm — src/config/blockchain.rs:47-118 sets, for account i,
    locators [i,2]=pk.x, [i,3]=pk.y, [i,4,0,0]=ZIESHA(=1),
    [i,4,0,1]=amount, then ZkStateBuilder::compress(); the compression
    rules are src/zk/mod.rs ZkStateModel semantics (Struct = Poseidon
    over the field compressions, List log4=k = 4-ary Poseidon Merkle
    over item compressions, absent subtrees = compression of the default
    all-zero item).  Uses ONLY the host Poseidon permutation — no
    bazuka_tpu.zk.state, no sparse-tree machinery."""
    from bazuka_tpu.zk.poseidon_host import poseidon

    l2 = load_initial_mpn_balances()

    # default token subtree: leaf = Struct{token-id=0, balance=0},
    # 3 levels of 4-ary Poseidon up to the token-tree root
    tok_default = [poseidon([0, 0])]
    for _ in range(3):
        tok_default.append(poseidon([tok_default[-1]] * 4))

    def account_hash(pkx: int, pky: int, amount: int) -> int:
        # token slot 0 = (ZIESHA=1, amount); slots 1..4^3-1 default
        node = poseidon([1, amount])
        for lvl in range(3):
            node = poseidon([node] + [tok_default[lvl]] * 3)
        # Struct{tx-nonce=0, withdraw-nonce=0, pk.x, pk.y, token-root}
        return poseidon([0, 0, pkx, pky, node])

    default_leaf = poseidon([0, 0, 0, 0, tok_default[-1]])

    # account i sits at leaf i of the depth-15 4-ary tree
    nodes = {}
    for i, (addr, amount) in enumerate(l2):
        pkx, pky = addr.pub_key.decompress()
        nodes[i] = account_hash(pkx, pky, amount)
    default = default_leaf
    for _ in range(15):
        parents = {}
        for idx in {i // 4 for i in nodes}:
            kids = [nodes.get(4 * idx + j, default) for j in range(4)]
            parents[idx] = poseidon(kids)
        nodes = parents
        default = poseidon([default] * 4)
    root = nodes.get(0, default)

    assert root == MPN_GENESIS_ROOT
    # state_size: 4 nonzero cells per account ([i,2],[i,3],[i,4,0,0],[i,4,0,1])
    assert 4 * len(l2) == MPN_GENESIS_SIZE


def test_genesis_block_pins():
    """Pin the genesis header hash and the serialized MPN-contract tx
    bytes so the whole genesis block (not just the MPN root) is
    regression-guarded."""
    import hashlib

    from bazuka_tpu.utils import ser

    conf = get_blockchain_config()
    assert conf.genesis.header.hash().hex() == GENESIS_HEADER_HASH
    raw = ser.dumps(conf.genesis.body[1])
    assert len(raw) == MPN_TX_BYTES_LEN
    assert hashlib.sha3_256(raw).hexdigest() == MPN_TX_BYTES_SHA3


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

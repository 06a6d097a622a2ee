"""MPN witness-generator tests (model: reference src/mpn/withdraw.rs tests,
src/mpn/deposit.rs semantics) — runs on the standalone MpnChainView."""

import pytest

from bazuka_tpu.core.transaction import ContractId, Money
from bazuka_tpu.db import Put, RamKvStore, keys
from bazuka_tpu.mpn import MpnConfig
from bazuka_tpu.mpn.account import get_mpn_account
from bazuka_tpu.mpn.chain_view import MpnChainView
from bazuka_tpu.mpn.deposit import deposit
from bazuka_tpu.mpn.update import update
from bazuka_tpu.mpn.withdraw import withdraw
from bazuka_tpu.utils import ser
from bazuka_tpu.wallet.tx_builder import TxBuilder
from bazuka_tpu.zk.poseidon_host import PoseidonHasher
from bazuka_tpu.zk.state import StateManager, ZkCompressedState, ZkContract

CID = ContractId(0xBEEF)
TOKEN = ContractId(123)


def make_config():
    return MpnConfig(
        log4_tree_size=3, log4_token_tree_size=1,
        log4_deposit_batch_size=1, log4_withdraw_batch_size=1,
        log4_update_batch_size=1, mpn_contract_id=CID,
    )


@pytest.fixture
def env():
    conf = make_config()
    db = RamKvStore()
    model = conf.state_model()
    contract = ZkContract(ZkCompressedState.empty(model), model)
    db.update([Put(keys.contract(str(CID)), ser.dumps(contract))])
    chain = MpnChainView(db)
    alice = TxBuilder(b"ABC")
    bob = TxBuilder(b"XYZ")
    return conf, chain, alice, bob


def do_deposit(conf, chain, who, amount, token=TOKEN, nonce=1, check_balance=False):
    new_idx = {}
    dep = who.deposit_mpn("", CID, who.get_mpn_address(), nonce,
                          Money(token, amount), Money.ziesha(0))
    out = deposit(CID, conf.log4_tree_size, conf.log4_token_tree_size,
                  conf.log4_deposit_batch_size, chain, [dep], new_idx,
                  check_balance=check_balance)
    for addr, idx in new_idx.items():
        chain.add_mpn_account_index(addr, idx)
    return out


def test_deposit_creates_account(env):
    conf, chain, alice, _ = env
    mgr = StateManager()
    root0 = mgr.root(chain.db, str(CID))
    new_root, pubs, transitions = do_deposit(conf, chain, alice, 10056)
    assert len(transitions) == 1
    assert pubs.state == root0.state_hash
    assert pubs.next_state == new_root.state_hash != root0.state_hash
    assert pubs.height == 0
    acc = get_mpn_account(mgr, chain.db, str(CID), 0)
    assert acc.address == alice.get_zk_address().decompress()
    assert acc.tokens[0].amount == 10056
    assert acc.tokens[0].token_id == TOKEN
    # committed root matches manager's view
    assert mgr.root(chain.db, str(CID)).state_hash == new_root.state_hash


def test_deposit_rejects_wrong_owner(env):
    conf, chain, alice, bob = env
    do_deposit(conf, chain, alice, 100)
    # bob deposits to an address owned by alice's slot? construct a deposit
    # whose mpn_address mismatches the existing account at index 0
    new_idx = {}
    dep = bob.deposit_mpn("", CID, bob.get_mpn_address(), 1,
                          Money(TOKEN, 5), Money.ziesha(0))
    # force-route bob's deposit to alice's index by clobbering the index map
    chain.add_mpn_account_index(bob.get_mpn_address(), 0)
    _, _, transitions = deposit(
        CID, conf.log4_tree_size, conf.log4_token_tree_size,
        conf.log4_deposit_batch_size, chain, [dep], new_idx)
    assert transitions == []


def test_deposit_check_balance(env):
    conf, chain, alice, _ = env
    # no L1 balance -> rejected
    _, _, transitions = do_deposit(conf, chain, alice, 50, check_balance=True)
    assert transitions == []
    # fund and retry
    chain.set_balance(alice.get_address(), TOKEN, 100)
    _, _, transitions = do_deposit(conf, chain, alice, 50, check_balance=True)
    assert len(transitions) == 1
    assert chain.get_balance(alice.get_address(), TOKEN) == 50


def test_withdraw_flow(env):
    conf, chain, alice, _ = env
    do_deposit(conf, chain, alice, 10056)
    wd = alice.withdraw_mpn("", CID, 1, Money(TOKEN, 30), Money(TOKEN, 26),
                            alice.get_address())
    assert wd.verify_calldata() and wd.verify_signature()
    new_root, pubs, transitions = withdraw(
        CID, conf.log4_tree_size, conf.log4_token_tree_size,
        conf.log4_withdraw_batch_size, chain, [wd], {})
    assert len(transitions) == 1
    mgr = StateManager()
    acc = get_mpn_account(mgr, chain.db, str(CID), 0)
    assert acc.tokens[0].amount == 10056 - 30 - 26
    assert acc.withdraw_nonce == 1
    # replay with same nonce is rejected
    _, _, t2 = withdraw(CID, conf.log4_tree_size, conf.log4_token_tree_size,
                        conf.log4_withdraw_batch_size, chain, [wd], {})
    assert t2 == []


def test_update_transfer(env):
    conf, chain, alice, bob = env
    do_deposit(conf, chain, alice, 1000)
    tx = alice.create_mpn_transaction(bob.get_mpn_address(),
                                      Money(TOKEN, 100), Money(TOKEN, 7), 1)
    assert tx.verify_signature()
    new_idx = {}
    new_root, pubs, transitions = update(
        CID, conf.log4_tree_size, conf.log4_token_tree_size,
        conf.log4_update_batch_size, TOKEN, chain, [tx], new_idx)
    assert len(transitions) == 1
    for addr, idx in new_idx.items():
        chain.add_mpn_account_index(addr, idx)
    mgr = StateManager()
    src = get_mpn_account(mgr, chain.db, str(CID), 0)
    dst = get_mpn_account(mgr, chain.db, str(CID), 1)
    assert src.tokens[0].amount == 1000 - 100 - 7
    assert src.tx_nonce == 1
    assert dst.tokens[0].amount == 100
    assert dst.address == bob.get_zk_address().decompress()
    # aux data commits the fee sum
    assert pubs.aux_data == PoseidonHasher.hash([TOKEN.scalar, 7])
    # merkle proof in the transition recomputes the PRE-state root
    t = transitions[0]
    leaf = PoseidonHasher.hash([
        t.src_before.tx_nonce, t.src_before.withdraw_nonce,
        t.src_before.address[0], t.src_before.address[1],
        t.src_before.tokens_hash(conf.log4_token_tree_size),
    ])
    acc_hash, ind = leaf, t.src_index
    for part in t.src_proof:
        row = list(part[: ind % 4]) + [acc_hash] + list(part[ind % 4 :])
        acc_hash = PoseidonHasher.hash(row)
        ind //= 4
    assert acc_hash == pubs.state


def test_update_rejects_bad_nonce_and_overspend(env):
    conf, chain, alice, bob = env
    do_deposit(conf, chain, alice, 50)
    bad_nonce = alice.create_mpn_transaction(bob.get_mpn_address(),
                                             Money(TOKEN, 10), Money(TOKEN, 0), 5)
    overspend = alice.create_mpn_transaction(bob.get_mpn_address(),
                                             Money(TOKEN, 100), Money(TOKEN, 0), 1)
    _, _, transitions = update(
        CID, conf.log4_tree_size, conf.log4_token_tree_size,
        conf.log4_update_batch_size, TOKEN, chain, [bad_nonce, overspend], {})
    assert transitions == []

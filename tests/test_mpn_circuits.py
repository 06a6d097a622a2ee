"""MPN circuit tests: the witness generators' transitions must satisfy
the circuits under the correct public inputs (model: reference
src/mpn/circuits/test.rs — empty + real batches at toy scale).
Satisfaction-only here; full Groth16 proving of these circuits is
covered by the slow-path tests."""

import pytest

from bazuka_tpu.blockchain.chain import prover_commitment
from bazuka_tpu.core.transaction import ContractId, Money
from bazuka_tpu.db import Put, RamKvStore, keys
from bazuka_tpu.mpn import MpnConfig
from bazuka_tpu.mpn.chain_view import MpnChainView
from bazuka_tpu.mpn.circuits import (
    DepositCircuit,
    UpdateCircuit,
    WithdrawCircuit,
    synthesize_circuit,
)
from bazuka_tpu.mpn.deposit import deposit
from bazuka_tpu.mpn.transitions import (
    DepositTransition,
    UpdateTransition,
    WithdrawTransition,
)
from bazuka_tpu.mpn.update import update
from bazuka_tpu.mpn.withdraw import withdraw
from bazuka_tpu.utils import ser
from bazuka_tpu.wallet.tx_builder import TxBuilder
from bazuka_tpu.zk.state import StateManager, ZkCompressedState, ZkContract

CID = ContractId(0xBEEF)
TOKEN = ContractId(123)
LOG4_TREE, LOG4_TOKEN, LOG4_BATCH = 3, 1, 1
BATCH = 1 << (2 * LOG4_BATCH)


@pytest.fixture
def env():
    db = RamKvStore()
    conf = MpnConfig(LOG4_TREE, LOG4_TOKEN, LOG4_BATCH, LOG4_BATCH, LOG4_BATCH, CID)
    model = conf.state_model()
    db.update([Put(keys.contract(str(CID)), ser.dumps(ZkContract(ZkCompressedState.empty(model), model)))])
    return conf, MpnChainView(db), TxBuilder(b"ABC"), TxBuilder(b"XYZ")


def pad(transitions, null_fn):
    out = list(transitions)
    while len(out) < BATCH:
        out.append(null_fn(LOG4_TREE, LOG4_TOKEN))
    return out


def test_empty_circuits_satisfied():
    # reference: circuits/test.rs empty-batch tests
    mgr_empty_root = None
    from bazuka_tpu.zk.state import compress_default
    from bazuka_tpu.mpn.config import MpnConfig as MC

    conf = MpnConfig(LOG4_TREE, LOG4_TOKEN, LOG4_BATCH, LOG4_BATCH, LOG4_BATCH, CID)
    root = compress_default(conf.state_model())
    from bazuka_tpu.mpn.deposit import compute_deposit_aux
    from bazuka_tpu.mpn.withdraw import compute_withdraw_aux
    from bazuka_tpu.zk.poseidon_host import PoseidonHasher

    dep = DepositCircuit.empty(LOG4_TREE, LOG4_TOKEN, LOG4_BATCH)
    dep.state = dep.next_state = root
    dep.aux_data = compute_deposit_aux([], LOG4_BATCH)
    assert synthesize_circuit(dep).is_satisfied() is None

    wd = WithdrawCircuit.empty(LOG4_TREE, LOG4_TOKEN, LOG4_BATCH)
    wd.state = wd.next_state = root
    wd.aux_data = compute_withdraw_aux([], LOG4_BATCH)
    assert synthesize_circuit(wd).is_satisfied() is None

    up = UpdateCircuit.empty(LOG4_TREE, LOG4_TOKEN, LOG4_BATCH)
    up.state = up.next_state = root
    up.fee_token = TOKEN.scalar
    up.aux_data = PoseidonHasher.hash([TOKEN.scalar, 0])
    assert synthesize_circuit(up).is_satisfied() is None


def _do_deposit(conf, chain, who, amount, nonce=1):
    idx = {}
    dep_tx = who.deposit_mpn("", CID, who.get_mpn_address(), nonce,
                             Money(TOKEN, amount), Money.ziesha(0))
    out = deposit(CID, LOG4_TREE, LOG4_TOKEN, LOG4_BATCH, chain, [dep_tx],
                  idx, check_balance=False)
    for a, i in idx.items():
        chain.add_mpn_account_index(a, i)
    return out


def test_deposit_circuit_with_real_batch(env):
    conf, chain, alice, _ = env
    new_root, pubs, transitions = _do_deposit(conf, chain, alice, 1000)
    circ = DepositCircuit(
        LOG4_TREE, LOG4_TOKEN, LOG4_BATCH,
        commitment=123, height=pubs.height, state=pubs.state,
        aux_data=pubs.aux_data, next_state=pubs.next_state,
        transitions=pad(transitions, DepositTransition.null),
    )
    cs = synthesize_circuit(circ)
    assert cs.is_satisfied() is None
    # wrong next_state breaks it
    circ.next_state = (pubs.next_state + 1)
    assert synthesize_circuit(circ).is_satisfied() is not None


def test_update_circuit_with_real_batch(env):
    conf, chain, alice, bob = env
    _do_deposit(conf, chain, alice, 1000)
    tx = alice.create_mpn_transaction(bob.get_mpn_address(),
                                      Money(TOKEN, 100), Money(TOKEN, 7), 1)
    idx = {}
    new_root, pubs, transitions = update(
        CID, LOG4_TREE, LOG4_TOKEN, LOG4_BATCH, TOKEN, chain, [tx], idx)
    assert len(transitions) == 1
    circ = UpdateCircuit(
        LOG4_TREE, LOG4_TOKEN, LOG4_BATCH,
        commitment=0, height=pubs.height, state=pubs.state,
        aux_data=pubs.aux_data, next_state=pubs.next_state,
        fee_token=TOKEN.scalar,
        transitions=pad(transitions, UpdateTransition.null),
    )
    cs = synthesize_circuit(circ)
    assert cs.is_satisfied() is None
    # tampered aux (wrong fee sum) breaks it
    circ.aux_data = (pubs.aux_data + 1)
    assert synthesize_circuit(circ).is_satisfied() is not None


def test_withdraw_circuit_with_real_batch(env):
    conf, chain, alice, _ = env
    _do_deposit(conf, chain, alice, 1000)
    wd_tx = alice.withdraw_mpn("", CID, 1, Money(TOKEN, 30), Money(TOKEN, 26),
                               alice.get_address())
    new_root, pubs, transitions = withdraw(
        CID, LOG4_TREE, LOG4_TOKEN, LOG4_BATCH, chain, [wd_tx], {})
    assert len(transitions) == 1
    circ = WithdrawCircuit(
        LOG4_TREE, LOG4_TOKEN, LOG4_BATCH,
        commitment=prover_commitment(alice.get_address(), 0),
        height=pubs.height, state=pubs.state,
        aux_data=pubs.aux_data, next_state=pubs.next_state,
        transitions=pad(transitions, WithdrawTransition.null),
    )
    cs = synthesize_circuit(circ)
    assert cs.is_satisfied() is None
    # tampering with the withdrawn amount breaks it
    transitions[0].tx.payment.amount = Money(TOKEN, 31)
    circ.transitions = pad(transitions, WithdrawTransition.null)
    assert synthesize_circuit(circ).is_satisfied() is not None

"""Blockchain engine tests (model: reference src/blockchain/test/):
genesis, balances, nonce/signature rejection, block production, rollback,
delegation/rewards, fork choice."""

import pytest

from bazuka_tpu.blockchain import BlockchainError, KvStoreChain, Mempool
from bazuka_tpu.blockchain import error as E
from bazuka_tpu.config.blockchain import TREASURY, get_test_blockchain_config
from bazuka_tpu.core import GeneralTransaction
from bazuka_tpu.core.transaction import ContractId, Money
from bazuka_tpu.db import RamKvStore
from bazuka_tpu.wallet.tx_builder import TxBuilder


@pytest.fixture
def chain():
    return KvStoreChain(RamKvStore(), get_test_blockchain_config())


ABC = TxBuilder(b"ABC")
DELEGATOR = TxBuilder(b"DELEGATOR")
VALIDATOR = TxBuilder(b"VALIDATOR")


def test_genesis(chain):
    assert chain.get_height() == 1
    assert chain.get_balance(ABC.get_address(), ContractId.ZIESHA) == 10000
    assert chain.get_balance(DELEGATOR.get_address(), ContractId.ZIESHA) == 100 - 75
    # treasury holds the rest of the supply
    supply = 2_000_000_000 * 10**9
    t = chain.get_balance(TREASURY, ContractId.ZIESHA)
    assert 0 < t < supply
    assert chain.get_stake(VALIDATOR.get_address()) == 25
    assert len(chain.get_stakers()) == 3
    assert chain.get_staker(VALIDATOR.get_address()) is not None
    # genesis header accessible, hash chain starts
    tip = chain.get_tip()
    assert tip.number == 0


def test_regular_send_and_nonce(chain):
    bob = TxBuilder(b"BOB")
    td = ABC.create_transaction("", bob.get_address(), Money.ziesha(500), Money.ziesha(1), 1)
    chain.apply_tx(td.tx)
    assert chain.get_balance(bob.get_address(), ContractId.ZIESHA) == 500
    assert chain.get_balance(ABC.get_address(), ContractId.ZIESHA) == 10000 - 501
    assert chain.get_nonce(ABC.get_address()) == 1
    # replay rejected
    with pytest.raises(E.InvalidTransactionNonce):
        chain.apply_tx(td.tx)
    # insufficient balance rejected
    td2 = ABC.create_transaction("", bob.get_address(), Money.ziesha(10**9), Money.ziesha(1), 2)
    with pytest.raises(E.BalanceInsufficient):
        chain.apply_tx(td2.tx)
    # bad signature rejected at block level (apply_tx doesn't check sigs;
    # blocks do — reference behavior)
    td3 = ABC.create_transaction("", bob.get_address(), Money.ziesha(1), Money.ziesha(1), 2)
    td3.tx.nonce = 3
    assert not td3.tx.verify_signature()


def test_treasury_access_denied(chain):
    from bazuka_tpu.core.transaction import RegularSendEntry, Transaction, TransactionData

    tx = Transaction(
        src=None, nonce=0,
        data=TransactionData("regular_send", entries=[
            RegularSendEntry(ABC.get_address(), Money.ziesha(1))]),
        fee=Money.ziesha(0), memo="",
    )
    with pytest.raises(E.IllegalTreasuryAccess):
        chain.apply_tx(tx, internal=False)


def test_draft_and_apply_block(chain):
    bob = TxBuilder(b"BOB")
    td = ABC.create_transaction("", bob.get_address(), Money.ziesha(100), Money.ziesha(5), 1)
    blk = chain.draft_block(10, [td], VALIDATOR, check=True)
    assert blk is not None
    assert len(blk.body) == 1
    h0 = chain.get_height()
    chain.apply_block(blk)
    assert chain.get_height() == h0 + 1
    assert chain.get_balance(bob.get_address(), ContractId.ZIESHA) == 100
    # validator got paid (reward + fees flow)
    assert chain.get_balance(VALIDATOR.get_address(), ContractId.ZIESHA) > 0


def test_rollback(chain):
    bob = TxBuilder(b"BOB")
    checksum_before = chain.db_checksum()
    td = ABC.create_transaction("", bob.get_address(), Money.ziesha(100), Money.ziesha(5), 1)
    blk = chain.draft_block(10, [td], VALIDATOR, check=True)
    chain.apply_block(blk)
    assert chain.db_checksum() != checksum_before
    chain.rollback()
    assert chain.get_height() == 1
    assert chain.db_checksum() == checksum_before
    assert chain.get_balance(bob.get_address(), ContractId.ZIESHA) == 0


def test_merkle_root_rejection(chain):
    bob = TxBuilder(b"BOB")
    td = ABC.create_transaction("", bob.get_address(), Money.ziesha(10), Money.ziesha(1), 1)
    blk = chain.draft_block(10, [td], VALIDATOR, check=True)
    assert blk.body
    blk.header.block_root = bytes([9] * 32)
    with pytest.raises(E.InvalidMerkleRoot):
        chain.apply_block(blk)


def test_parent_hash_rejection(chain):
    blk = chain.draft_block(10, [], VALIDATOR, check=True)
    blk.header.parent_hash = bytes([1] * 32)
    blk.header.block_root = blk.merkle_tree().root()
    with pytest.raises(E.InvalidParentHash):
        chain.apply_block(blk)


def test_extend_and_power(chain):
    blk1 = chain.draft_block(10, [], VALIDATOR, check=True)
    chain.apply_block(blk1)
    p1 = chain.get_power()
    blk2 = chain.draft_block(20, [], VALIDATOR, check=True)
    chain.apply_block(blk2)
    assert chain.get_power() > p1
    assert chain.get_height() == 3
    # headers iterate
    headers = chain.get_headers(0, 10)
    assert [h.number for h in headers] == [0, 1, 2]
    # will_extend: a longer chain wins, a weaker one doesn't
    assert not chain.will_extend(2, [])


def test_delegate_undelegate_flow(chain):
    # delegator delegates 10 more to VALIDATOR
    td = DELEGATOR.delegate("", VALIDATOR.get_address(), 10, Money.ziesha(0), 1)
    chain.apply_tx(td.tx)
    assert chain.get_stake(VALIDATOR.get_address()) == 35
    assert chain.get_delegate(DELEGATOR.get_address(), VALIDATOR.get_address()).amount == 35
    delegators = chain.get_delegators(VALIDATOR.get_address())
    assert (str(DELEGATOR.get_address()), 35) in delegators
    # undelegate 5; funds locked then released after 10 blocks
    td2 = DELEGATOR.undelegate("", VALIDATOR.get_address(), 5, Money.ziesha(0), 2)
    chain.apply_tx(td2.tx)
    assert chain.get_stake(VALIDATOR.get_address()) == 30
    undels = chain.get_undelegations(DELEGATOR.get_address())
    assert len(undels) == 1
    assert undels[0][1].amount == 5


def test_mempool_nonce_chaining(chain):
    pool = Mempool(min_balance_per_tx=1)  # ABC's 10000 units allow many txs
    bob = TxBuilder(b"BOB")
    tds = [
        ABC.create_transaction("", bob.get_address(), Money.ziesha(10), Money.ziesha(1), n)
        for n in (1, 2, 4)  # gap at 3
    ]
    for td in tds:
        pool.add_tx(chain, GeneralTransaction(td), False, now=0)
    accepted = [tx.inner.tx.nonce for tx, _ in pool.all()]
    assert accepted == [1, 2]  # 4 not applicable
    # old nonce rejected
    td_old = ABC.create_transaction("", bob.get_address(), Money.ziesha(10), Money.ziesha(1), 1)
    before = len(pool)
    pool.add_tx(chain, GeneralTransaction(td_old), False, now=0)
    assert len(pool) == before  # duplicate nonce not double-added


def test_currency_in_circulation(chain):
    total = chain.currency_in_circulation()
    assert total == 2_000_000_000 * 10**9

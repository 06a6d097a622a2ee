"""End-to-end MPN proving pipeline with Dummy proofs (model: reference
generate_block heartbeat flow, src/node/heartbeat/generate_block.rs):
prepare_works -> worker get_works -> prove -> ready -> UpdateContract tx
applies on-chain with recomputed state roots."""

import pytest

pytestmark = pytest.mark.slow  # compile/execution-heavy device kernels

from bazuka_tpu.blockchain import KvStoreChain
from bazuka_tpu.config.blockchain import get_test_blockchain_config
from bazuka_tpu.core.transaction import ContractId, Money
from bazuka_tpu.db import Put, RamKvStore, keys
from bazuka_tpu.mpn.workpool import MpnWorker, prepare_works
from bazuka_tpu.wallet.tx_builder import TxBuilder
from bazuka_tpu.zk.proof import ZkProof
from bazuka_tpu.zk.state import u64_to_blob


@pytest.fixture
def env():
    conf = get_test_blockchain_config()
    conf.mpn_config.mpn_num_update_batches = 1
    conf.mpn_config.mpn_num_deposit_batches = 1
    conf.mpn_config.mpn_num_withdraw_batches = 1
    chain = KvStoreChain(RamKvStore(), conf)
    validator = TxBuilder(b"VALIDATOR")
    user = TxBuilder(b"ABC")
    return conf, chain, validator, user


def test_full_pipeline_with_dummy_proofs(env):
    conf, chain, validator, user = env
    mpn_conf = conf.mpn_config
    worker = TxBuilder(b"WORKER")

    # the validator will self-deposit the remaining block reward; give the
    # validator the L1 funds the on-chain apply will expect
    chain._set_balance(validator.get_address(), ContractId.ZIESHA, 1000)

    # a user deposit riding the batch
    user_dep = user.deposit_mpn(
        "", mpn_conf.mpn_contract_id, user.get_mpn_address(), 1,
        Money.ziesha(400), Money.ziesha(0),
    )

    pool = prepare_works(
        mpn_conf, chain, {"w": MpnWorker(worker.get_address())},
        deposits=[user_dep], withdraws=[], updates=[],
        block_reward=100, deposit_reward=10, withdraw_reward=10,
        update_reward=10,
        validator_deposit_nonce=chain.get_deposit_nonce(
            validator.get_address(), mpn_conf.mpn_contract_id
        ),
        validator_tx_builder=validator, user_tx_builder=validator,
    )
    assert len(pool.works) == 3
    assert pool.ready(validator, 1) is None  # not proven yet

    # worker pulls jobs and submits dummy proofs
    jobs = pool.get_works(worker.get_address())
    assert 1 <= len(jobs) <= 2
    for wid in list(pool.works):
        assert pool.prove(wid, worker.get_address(), ZkProof.dummy(True))
    # double-submission returns False
    assert not pool.prove(0, worker.get_address(), ZkProof.dummy(True))

    td = pool.ready(validator, nonce=chain.get_nonce(validator.get_address()) + 1)
    assert td is not None
    assert len(td.tx.data.updates) == 3

    # apply on-chain: proofs (Dummy) + recomputed roots must check out
    chain.apply_tx(td.tx)
    # user's L2 account exists with the deposited amount
    acc = chain.get_mpn_account(user.get_mpn_address())
    assert acc.tokens[0].amount == 400
    assert acc.tokens[0].token_id == ContractId.ZIESHA
    # validator's reward self-deposit landed too (70 = 100 - 3*10)
    vacc = chain.get_mpn_account(validator.get_mpn_address())
    assert vacc.tokens[0].amount == 70
    # worker got the proving rewards on L1
    assert chain.get_balance(worker.get_address(), ContractId.ZIESHA) == 30
    # contract account advanced
    ca = chain.get_contract_account(mpn_conf.mpn_contract_id)
    assert ca.height == 2


def test_pipeline_rejects_bad_proof(env):
    conf, chain, validator, user = env
    mpn_conf = conf.mpn_config
    chain._set_balance(validator.get_address(), ContractId.ZIESHA, 1000)
    pool = prepare_works(
        mpn_conf, chain, {}, deposits=[], withdraws=[], updates=[],
        block_reward=100, deposit_reward=10, withdraw_reward=10,
        update_reward=10,
        validator_deposit_nonce=0,
        validator_tx_builder=validator, user_tx_builder=validator,
    )
    assert not pool.prove(0, validator.get_address(), ZkProof.dummy(False))
    assert pool.ready(validator, 1) is None

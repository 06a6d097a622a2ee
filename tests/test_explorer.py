"""Explorer JSON views (reference: src/client/explorer.rs).

The genesis block carries a create_contract with the full MPN model +
verifier keys — rendering it exercises every zk view: state models,
VK summaries, compressed states, data pairs."""

import json

from bazuka_tpu.config.blockchain import get_test_blockchain_config
from bazuka_tpu.core import GeneralTransaction
from bazuka_tpu.core.transaction import ContractId, Money
from bazuka_tpu.node.explorer import (
    block_to_json,
    contract_to_json,
    general_tx_to_json,
    state_model_to_json,
)
from bazuka_tpu.wallet.tx_builder import TxBuilder


def test_genesis_block_view_renders():
    conf = get_test_blockchain_config()
    view = block_to_json(conf.genesis)
    assert json.dumps(view)  # serializable end-to-end
    assert view["header"]["number"] == 0
    kinds = [list(tx["data"].keys())[0] for tx in view["body"]]
    assert "CreateContract" in kinds
    # the genesis has two CreateContracts: the Ziesha token (Scalar
    # model) and the MPN contract (List-of-accounts model) — take MPN
    cc = next(
        tx["data"]["CreateContract"] for tx in view["body"]
        if "CreateContract" in tx["data"]
        and tx["data"]["CreateContract"]["contract"]["deposit_functions"]
    )
    c = cc["contract"]
    # full contract detail: model tree + typed VK summaries
    assert "List" in json.dumps(c["state_model"])
    assert c["deposit_functions"][0]["verifier_key"]["kind"] in (
        "groth16", "dummy",
    )
    assert c["initial_state"]["state_hash"].startswith("0x")
    assert cc["money"]["amount"] == 0


def test_general_tx_views():
    alice = TxBuilder(b"ALICE")
    cid = ContractId(7)
    dep = alice.deposit_mpn("m", cid, alice.get_mpn_address(), 1,
                            Money.ziesha(10), Money.ziesha(1))
    v = general_tx_to_json(GeneralTransaction(dep))
    assert v["MpnDeposit"]["payment"]["amount"]["amount"] == 10

    tx = alice.create_mpn_transaction(
        alice.get_mpn_address(), Money.ziesha(5), Money.ziesha(1), 1
    )
    v2 = general_tx_to_json(GeneralTransaction(tx))
    assert v2["MpnTransaction"]["nonce"] == 1
    assert v2["MpnTransaction"]["sig"]

    wd = alice.withdraw_mpn("m", cid, 1, Money.ziesha(5), Money.ziesha(1),
                            alice.get_address())
    v3 = general_tx_to_json(GeneralTransaction(wd))
    assert v3["MpnWithdraw"]["payment"]["calldata"].startswith("0x")
    assert json.dumps([v, v2, v3])


def test_state_model_roundtrip_shape():
    from bazuka_tpu.mpn.config import MpnConfig

    model = MpnConfig(3, 1, 1, 1, 1, ContractId.NULL).state_model()
    j = state_model_to_json(model)
    assert j["List"]["log4_size"] == 3

"""Explorer JSON mirrors of chain types (reference: src/client/explorer.rs).

Every chain object has a human-readable JSON view used by the explorer
endpoints; blobs/hashes are hex, addresses are display strings.
"""

from __future__ import annotations

from ..core.blocks import Block
from ..core.header import Header
from ..core.transaction import (
    ContractUpdate,
    Transaction,
    TransactionData,
)


def money_to_json(m):
    return {"token_id": str(m.token_id), "amount": m.amount}


def header_to_json(h: Header):
    return {
        "parent_hash": h.parent_hash.hex(),
        "number": h.number,
        "block_root": h.block_root.hex(),
        "proof_of_stake": {
            "timestamp": h.proof_of_stake.timestamp,
            "validator": str(h.proof_of_stake.validator),
            "attempt": h.proof_of_stake.proof.attempt
            if h.proof_of_stake.proof
            else None,
        },
        "hash": h.hash().hex(),
    }


def contract_update_to_json(u: ContractUpdate):
    out = {
        "circuit_id": u.circuit_id,
        "kind": u.data.kind,
        "next_state": hex(u.next_state.state_hash),
        "prover": str(u.prover),
        "reward": u.reward,
        "proof_kind": u.proof.kind,
    }
    if u.data.kind == "deposit":
        out["deposits"] = [
            {
                "src": str(d.src), "amount": money_to_json(d.amount),
                "fee": money_to_json(d.fee), "nonce": d.nonce,
                "calldata": hex(d.calldata),
            }
            for d in u.data.deposits
        ]
    elif u.data.kind == "withdraw":
        out["withdraws"] = [
            {
                "dst": str(w.dst), "amount": money_to_json(w.amount),
                "fee": money_to_json(w.fee), "calldata": hex(w.calldata),
            }
            for w in u.data.withdraws
        ]
    elif u.data.kind == "function_call":
        out["fee"] = money_to_json(u.data.fee)
    elif u.data.kind == "mint":
        out["amount"] = u.data.amount
    return out


def tx_data_to_json(d: TransactionData):
    if d.kind == "regular_send":
        return {
            "RegularSend": [
                {"dst": str(e.dst), "amount": money_to_json(e.amount)}
                for e in d.entries
            ]
        }
    if d.kind == "delegate":
        return {"Delegate": {"to": str(d.to), "amount": d.amount}}
    if d.kind == "undelegate":
        return {"Undelegate": {"from": str(d.frm), "amount": d.amount}}
    if d.kind == "auto_delegate":
        return {"AutoDelegate": {"to": str(d.to), "ratio": d.ratio.value}}
    if d.kind == "update_staker":
        return {
            "UpdateStaker": {
                "vrf_pub_key": d.vrf_pub_key,
                "commission": d.commission.value,
            }
        }
    if d.kind == "create_contract":
        token = None
        if d.contract is not None and d.contract.token is not None:
            t = d.contract.token.token
            token = {"name": t.name, "symbol": t.symbol, "supply": t.supply}
        return {"CreateContract": {"token": token}}
    if d.kind == "update_contract":
        return {
            "UpdateContract": {
                "contract_id": str(d.contract_id),
                "updates": [contract_update_to_json(u) for u in d.updates],
            }
        }
    return {d.kind: {}}


def tx_to_json(tx: Transaction):
    return {
        "hash": tx.hash().hex(),
        "src": str(tx.src) if tx.src else None,  # None = treasury
        "nonce": tx.nonce,
        "fee": money_to_json(tx.fee),
        "memo": tx.memo,
        "data": tx_data_to_json(tx.data),
    }


def block_to_json(b: Block):
    return {
        "header": header_to_json(b.header),
        "body": [tx_to_json(tx) for tx in b.body],
    }

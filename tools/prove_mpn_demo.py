#!/usr/bin/env python
"""End-to-end REAL Groth16 proving of the MPN circuits (BASELINE config 5).

Flow (mirrors the validator pipeline, reference: generate_block heartbeat):
  1. build a toy MPN state, run the witness generators on real txs
  2. deterministic keygen for the circuit (TPU batched fixed-base muls)
  3. prove on TPU: NTT h(x) + 4 G1 MSMs + 1 G2 MSM
  4. verify through the work pool's check (host pairing) — accept and
     tamper-reject paths

Usage: python tools/prove_mpn_demo.py [deposit|update|withdraw] [--log4-batch 1]
"""

import argparse
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("circuit", nargs="?", default="deposit",
                    choices=["deposit", "update", "withdraw"])
    ap.add_argument("--log4-batch", type=int, default=1)
    ap.add_argument("--log4-tree", type=int, default=3)
    ap.add_argument("--log4-token-tree", type=int, default=1)
    ap.add_argument("--warm-proves", type=int, default=0,
                    help="extra timed proves on the warm pipeline")
    ap.add_argument("--skip-check", action="store_true",
                    help="skip the host-side satisfaction check")
    ap.add_argument("--params-cache", default=None,
                    help=".npz path: load the proving key if present, "
                         "else keygen once and save it there")
    args = ap.parse_args()

    from bazuka_tpu.utils.jaxcfg import enable_compile_cache

    enable_compile_cache()

    from bazuka_tpu.blockchain.chain import prover_commitment
    from bazuka_tpu.core.transaction import ContractId, Money
    from bazuka_tpu.db import Put, RamKvStore, keys
    from bazuka_tpu.groth16.keygen import generate_parameters
    from bazuka_tpu.groth16.prove import create_proof
    from bazuka_tpu.groth16.verify import groth16_verify
    from bazuka_tpu.mpn.chain_view import MpnChainView
    from bazuka_tpu.mpn import circuits as circ_mod
    from bazuka_tpu.mpn.deposit import deposit
    from bazuka_tpu.mpn.transitions import (
        DepositTransition, UpdateTransition, WithdrawTransition,
    )
    from bazuka_tpu.mpn.update import update
    from bazuka_tpu.mpn.withdraw import withdraw
    from bazuka_tpu.utils import ser
    from bazuka_tpu.wallet.tx_builder import TxBuilder
    from bazuka_tpu.zk.state import ZkCompressedState, ZkContract

    CID = ContractId(0xBEEF)
    TOKEN = ContractId(123)
    LT, LTok, LB = args.log4_tree, args.log4_token_tree, args.log4_batch
    BATCH = 1 << (2 * LB)

    # -- state + witness generation
    db = RamKvStore()
    from bazuka_tpu.mpn.config import MpnConfig

    conf = MpnConfig(LT, LTok, LB, LB, LB, CID)
    model = conf.state_model()
    db.update([Put(keys.contract(str(CID)),
                   ser.dumps(ZkContract(ZkCompressedState.empty(model), model)))])
    chain = MpnChainView(db)
    alice, bob = TxBuilder(b"ABC"), TxBuilder(b"XYZ")

    idx = {}
    deps = [
        alice.deposit_mpn("", CID, alice.get_mpn_address(), 1,
                          Money(TOKEN, 1000), Money.ziesha(0))
    ]
    new_root, pubs, dep_transitions = deposit(
        CID, LT, LTok, LB, chain, deps, idx, check_balance=False)
    for a, i in idx.items():
        chain.add_mpn_account_index(a, i)

    if args.circuit == "deposit":
        transitions, pubs_used = dep_transitions, pubs
        circuit = circ_mod.DepositCircuit(LT, LTok, LB)
        null_fn = DepositTransition.null
    elif args.circuit == "update":
        tx = alice.create_mpn_transaction(bob.get_mpn_address(),
                                          Money(TOKEN, 100), Money(TOKEN, 7), 1)
        idx2 = {}
        _, pubs_used, transitions = update(CID, LT, LTok, LB, TOKEN, chain, [tx], idx2)
        circuit = circ_mod.UpdateCircuit(LT, LTok, LB, fee_token=TOKEN.scalar)
        null_fn = UpdateTransition.null
    else:
        wd = alice.withdraw_mpn("", CID, 1, Money(TOKEN, 30), Money(TOKEN, 26),
                                alice.get_address())
        _, pubs_used, transitions = withdraw(CID, LT, LTok, LB, chain, [wd], {})
        circuit = circ_mod.WithdrawCircuit(LT, LTok, LB)
        null_fn = WithdrawTransition.null

    prover = TxBuilder(b"WORKER")
    reward = 10
    commitment = prover_commitment(prover.get_address(), reward)
    circuit.commitment = commitment
    circuit.height = pubs_used.height
    circuit.state = pubs_used.state
    circuit.aux_data = pubs_used.aux_data
    circuit.next_state = pubs_used.next_state
    circuit.transitions = list(transitions) + [
        null_fn(LT, LTok) for _ in range(BATCH - len(transitions))
    ]

    t0 = time.perf_counter()
    cs = circ_mod.synthesize_circuit(circuit)
    n_constraints = cs.n_constraints
    n_vars = len(cs.assignment)
    print(f"[{args.circuit}] synthesized: {n_constraints} constraints, "
          f"{n_vars} vars in {time.perf_counter()-t0:.1f}s", flush=True)
    if not args.skip_check:
        bad = cs.is_satisfied()
        assert bad is None, f"constraint {bad} unsatisfied!"
        print("witness satisfies the circuit", flush=True)

    import os

    t0 = time.perf_counter()
    if args.params_cache and os.path.exists(args.params_cache):
        from bazuka_tpu.groth16.keygen import load_parameters

        params = load_parameters(args.params_cache)
        print(f"params loaded from {args.params_cache} in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    else:
        params = generate_parameters(cs, seed=b"mpn-demo")
        print(f"keygen: {time.perf_counter()-t0:.1f}s "
              f"(|pk| = {params.pk.a_query[0].shape[0]} G1 x3 + "
              f"{params.pk.h_query[0].shape[0]} h + "
              f"{params.pk.b_g2_query[0].shape[0]} G2)", flush=True)
        if args.params_cache:
            from bazuka_tpu.groth16.keygen import save_parameters

            t0 = time.perf_counter()
            save_parameters(params, args.params_cache)
            print(f"params saved to {args.params_cache} in "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    proof = create_proof(params, cs, r=7, s=11)
    print(f"prove (cold): {time.perf_counter()-t0:.1f}s", flush=True)
    for i in range(args.warm_proves):
        t0 = time.perf_counter()
        proof = create_proof(params, cs, r=7 + i, s=11 + i)
        print(f"prove (warm {i}): {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    inputs = [commitment, pubs_used.height, pubs_used.state,
              pubs_used.aux_data, pubs_used.next_state]
    ok = groth16_verify(params.vk, inputs, proof)
    print(f"verify: {ok} in {time.perf_counter()-t0:.1f}s", flush=True)
    assert ok, "proof rejected!"
    bad_inputs = list(inputs)
    bad_inputs[4] = (bad_inputs[4] + 1)
    assert not groth16_verify(params.vk, bad_inputs, proof), \
        "tampered next_state accepted!"
    print("tampered public input rejected", flush=True)
    print("END-TO-END MPN GROTH16 PROOF OK", flush=True)


if __name__ == "__main__":
    main()

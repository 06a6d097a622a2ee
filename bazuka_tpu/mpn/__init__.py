"""MPN (Main Payment Network) — the Groth16 zk-rollup engine.

Components (reference: src/mpn/):
  * account.py  — MpnAccount codec over the sparse state tree
  * config.py   — MpnConfig + the account-tree state model
  * deposit.py / withdraw.py / update.py — witness generators: replay
    candidate txs against forked state, emit per-tx Transitions with all
    Merkle proofs + ZkPublicInputs
  * workpool.py — validator-side distributed-proving coordinator
  * circuits/   — the three Groth16 circuits (over bazuka_tpu.groth16)
"""

from .account import MpnAccount
from .config import MpnConfig, ZkPublicInputs

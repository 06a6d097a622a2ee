"""Groth16 proving system over BLS12-381, TPU-native.

Replaces the reference's external `bellman` prover (SURVEY.md §2.2):
  * r1cs.py    — constraint system + gadget substrate
  * qap.py     — R1CS -> QAP reduction (Lagrange / NTT domains)
  * keygen.py  — deterministic dev-mode parameter generation
                 (reference semantics: src/config/blockchain.rs:355-417)
  * prove.py   — prover: sparse matvecs + 3 iNTT + coset NTT + h(x),
                 then 4 G1 MSMs + 1 G2 MSM on TPU
  * verify.py  — pairing verification (reference: src/zk/groth16/mod.rs:67-121)
"""

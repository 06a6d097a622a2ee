"""Cryptography layer: curves, signatures, VRF, hashes, Merkle trees.

Scheme protocols mirror the reference's trait surface
(reference: src/crypto/mod.rs:15-84):
  * SignatureScheme        — L1 signatures (ed25519)
  * ZkSignatureScheme      — in-circuit-friendly signatures (JubJub EdDSA)
  * VerifiableRandomFunction — PoS leader election (VRF)
"""

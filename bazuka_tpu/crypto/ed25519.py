"""Ed25519 L1 signature scheme (reference: src/crypto/ed25519.rs).

Backed by the `cryptography` package.  Key derivation matches the
reference's: secret = SHA3(seed) with the top byte masked to 0x7f
(reference: src/crypto/ed25519.rs:70-78).  Addresses display as
`ed<64 hex>` with byte-reversed key material (reference: :86-95).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from cryptography.exceptions import InvalidSignature
from cryptography.hazmat.primitives import serialization
from cryptography.hazmat.primitives.asymmetric.ed25519 import (
    Ed25519PrivateKey,
    Ed25519PublicKey,
)


@dataclass(frozen=True)
class PublicKey:
    raw: bytes  # 32 bytes

    def __str__(self) -> str:
        return "ed" + self.raw[::-1].hex()

    @staticmethod
    def parse(s: str) -> "PublicKey":
        if len(s) != 66 or not s.lower().startswith("ed"):
            raise ValueError("public key invalid")
        raw = bytes.fromhex(s[2:])[::-1]
        # validate the point
        try:
            Ed25519PublicKey.from_public_bytes(raw)
        except Exception:
            raise ValueError("public key invalid")
        return PublicKey(raw)


@dataclass(frozen=True)
class PrivateKey:
    raw: bytes  # 32-byte seed

    @property
    def public(self) -> PublicKey:
        sk = Ed25519PrivateKey.from_private_bytes(self.raw)
        return PublicKey(
            sk.public_key().public_bytes(
                serialization.Encoding.Raw, serialization.PublicFormat.Raw
            )
        )


ZERO_SIG = bytes(64)


class Ed25519:
    """SignatureScheme: generate_keys / sign / verify over raw bytes."""

    @staticmethod
    def generate_keys(seed: bytes):
        secret = bytearray(hashlib.sha3_256(seed).digest())
        secret[31] &= 0x7F
        sk = PrivateKey(bytes(secret))
        return sk.public, sk

    @staticmethod
    def sign(sk: PrivateKey, message: bytes) -> bytes:
        return Ed25519PrivateKey.from_private_bytes(sk.raw).sign(message)

    @staticmethod
    def verify(pk: PublicKey, message: bytes, sig: bytes) -> bool:
        try:
            Ed25519PublicKey.from_public_bytes(pk.raw).verify(sig, message)
            return True
        except (InvalidSignature, ValueError):
            return False

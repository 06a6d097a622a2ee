"""Wallets: mnemonic -> per-role seeds -> TxBuilder key bundles
(reference: src/wallet/mod.rs).

Seed derivation is BIP39-compatible (PBKDF2-HMAC-SHA512, 2048 rounds,
salt "mnemonic"+passphrase) so externally-generated standard mnemonics
import verbatim; locally-generated phrases use a compact embedded
wordlist (16 words x 8 bits = 128-bit entropy + 1 checksum word) since
the 2048-word English list isn't vendored.
"""

from __future__ import annotations

import hashlib
import json
import os
import secrets
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from ..core import GeneralTransaction, NonceGroup
from ..core.transaction import ContractId
from .tx_builder import TxBuilder

# 256 short distinct words (16 consonant-vowel pairs squared)
_SYL = ["ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
        "na", "pe", "ri", "so", "tu", "za"]
WORDLIST = [a + b for a in _SYL for b in _SYL]
_WORD_INDEX = {w: i for i, w in enumerate(WORDLIST)}


class Mnemonic:
    def __init__(self, phrase: str):
        self.phrase = phrase.strip()

    @staticmethod
    def generate(entropy_bytes: int = 16) -> "Mnemonic":
        ent = secrets.token_bytes(entropy_bytes)
        check = hashlib.sha3_256(ent).digest()[0]
        words = [WORDLIST[b] for b in ent + bytes([check])]
        return Mnemonic(" ".join(words))

    def validate_checksum(self) -> bool:
        words = self.phrase.split()
        if any(w not in _WORD_INDEX for w in words) or len(words) < 2:
            return False
        data = bytes(_WORD_INDEX[w] for w in words)
        return hashlib.sha3_256(data[:-1]).digest()[0] == data[-1]

    def to_seed(self, passphrase: str = "") -> bytes:
        """BIP39 seed derivation (works for ANY phrase)."""
        return hashlib.pbkdf2_hmac(
            "sha512",
            self.phrase.encode("utf-8"),
            b"mnemonic" + passphrase.encode("utf-8"),
            2048,
            dklen=64,
        )

    def __str__(self):
        return self.phrase


USER = "user"
VALIDATOR = "validator"


def _passphrase(wallet_type: str, index: int = 0) -> str:
    if wallet_type == VALIDATOR:
        return "validator"
    return "" if index == 0 else str(index)


@dataclass
class Wallet:
    """One role's wallet: token list + pending-tx tracking
    (reference: src/wallet/mod.rs:88-140)."""

    mnemonic: Mnemonic
    wallet_type: str
    index: int = 0
    tokens: List[ContractId] = field(default_factory=lambda: [ContractId.ZIESHA])
    txs: Dict[NonceGroup, List[GeneralTransaction]] = field(default_factory=dict)

    def seed(self) -> bytes:
        return self.mnemonic.to_seed(_passphrase(self.wallet_type, self.index))

    def tx_builder(self) -> TxBuilder:
        return TxBuilder(self.seed())

    def add_token(self, token_id: ContractId):
        if token_id not in self.tokens:
            self.tokens.append(token_id)

    def add_tx(self, tx: GeneralTransaction):
        self.txs.setdefault(tx.nonce_group(), []).append(tx)

    def new_nonce(self, group: NonceGroup) -> Optional[int]:
        pending = self.txs.get(group)
        if pending:
            return max(tx.nonce() for tx in pending) + 1
        return None

    def reset(self):
        for k in self.txs:
            self.txs[k] = []


class WalletCollection:
    """Mnemonic + per-role wallets, persisted as JSON
    (reference: src/wallet/mod.rs:45-87)."""

    def __init__(self, mnemonic: Optional[Mnemonic] = None):
        self.mnemonic = mnemonic or Mnemonic.generate()
        self.wallets: Dict[str, Wallet] = {}

    def user(self, index: int) -> Wallet:
        key = f"{USER}-{index}"
        if key not in self.wallets:
            self.wallets[key] = Wallet(self.mnemonic, USER, index)
        return self.wallets[key]

    def validator(self) -> Wallet:
        if VALIDATOR not in self.wallets:
            self.wallets[VALIDATOR] = Wallet(self.mnemonic, VALIDATOR)
        return self.wallets[VALIDATOR]

    def save(self, path: str):
        data = {
            "mnemonic": str(self.mnemonic),
            "wallets": {
                key: {"tokens": [str(t) for t in w.tokens]}
                for key, w in self.wallets.items()
            },
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, path)

    @staticmethod
    def open(path: str) -> Optional["WalletCollection"]:
        if not os.path.exists(path):
            return None
        with open(path) as f:
            data = json.load(f)
        wc = WalletCollection(Mnemonic(data["mnemonic"]))
        for key, wdata in data.get("wallets", {}).items():
            if key == VALIDATOR:
                w = wc.validator()
            else:
                w = wc.user(int(key.split("-")[1]))
            w.tokens = [ContractId.parse(t) for t in wdata.get("tokens", [])]
        return wc

"""Wallet mnemonics: standard BIP39 vectors (generation, checksum,
seed derivation) against the official Trezor test vectors, plus the
legacy compact-phrase import path (reference: src/wallet/mod.rs:16-35
uses the bip39 crate — this validates interchangeability)."""

import hashlib
import os

from bazuka_tpu.wallet import _LEGACY_WORDS, WORDLIST, Mnemonic

# (entropy hex, expected phrase, expected seed hex with passphrase
# "TREZOR") — BIP39 spec test vectors
VECTORS = [
    (
        "00000000000000000000000000000000",
        "abandon abandon abandon abandon abandon abandon abandon abandon"
        " abandon abandon abandon about",
        "c55257c360c07c72029aebc1b53c05ed0362ada38ead3e3e9efa3708e5349553"
        "1f09a6987599d18264c1e1c92f2cf141630c7a3c4ab7c81b2f001698e7463b04",
    ),
    (
        "7f7f7f7f7f7f7f7f7f7f7f7f7f7f7f7f",
        "legal winner thank year wave sausage worth useful legal winner"
        " thank yellow",
        None,
    ),
    (
        "9e885d952ad362caeb4efe34a8e91bd2",
        "ozone drill grab fiber curtain grace pudding thank cruise elder"
        " eight picnic",
        None,
    ),
    (
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff",
        "zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo zoo"
        " zoo zoo zoo zoo zoo zoo zoo vote",
        None,
    ),
]


def test_wordlist_is_canonical():
    assert len(WORDLIST) == 2048
    data = "\n".join(WORDLIST) + "\n"
    assert (
        hashlib.sha256(data.encode()).hexdigest()
        == "2f5eed53a4727b4bf8880d8f3f199efc90e58503646d9ff8eff3a2ed3b24dbda"
    )


def test_bip39_encoding_vectors():
    for ent_hex, phrase, _seed in VECTORS:
        m = Mnemonic.from_entropy(bytes.fromhex(ent_hex))
        assert m.phrase == phrase, ent_hex
        assert m.validate_checksum()


def test_bip39_seed_vector():
    m = Mnemonic(VECTORS[0][1])
    assert m.to_seed("TREZOR").hex() == VECTORS[0][2]


def test_checksum_rejects_tampering():
    m = Mnemonic.from_entropy(bytes(16))
    words = m.phrase.split()
    words[0] = "ability"  # flip the first word
    assert not Mnemonic(" ".join(words)).validate_checksum()
    # wrong word count
    assert not Mnemonic(" ".join(words[:11])).validate_checksum()


def test_generated_phrases_are_standard():
    m = Mnemonic.generate()
    assert len(m.phrase.split()) == 12
    assert all(w in WORDLIST for w in m.phrase.split())
    assert m.validate_checksum()


def test_legacy_compact_phrases_still_import():
    data = os.urandom(8)
    check = hashlib.sha3_256(data).digest()[0]
    phrase = " ".join(_LEGACY_WORDS[b] for b in data + bytes([check]))
    assert Mnemonic(phrase).validate_checksum()
    bad = phrase.split()
    bad[0] = _LEGACY_WORDS[(data[0] + 1) % 256]
    assert not Mnemonic(" ".join(bad)).validate_checksum()

"""KV-store tests (model: reference src/db/test.rs — RAM vs disk
consistency, prefix iteration, mirror overlay & rollback)."""

import os

from bazuka_tpu.db import DiskKvStore, Put, RamKvStore, Remove


def fill(store):
    store.update(
        [
            Put("aa", b"1"),
            Put("ab", b"2"),
            Put("b", b"3"),
            Put("ba", b"4"),
        ]
    )


def test_ram_basic():
    s = RamKvStore()
    fill(s)
    assert s.get("aa") == b"1"
    assert s.get("zz") is None
    assert s.pairs("a") == [("aa", b"1"), ("ab", b"2")]
    assert [k for k, _ in s.pairs("")] == ["aa", "ab", "b", "ba"]
    s.update([Remove("aa"), Put("ab", b"9")])
    assert s.get("aa") is None
    assert s.pairs("a") == [("ab", b"9")]


def test_disk_matches_ram(tmp_path):
    ram = RamKvStore()
    disk = DiskKvStore(os.fspath(tmp_path / "kv.sqlite"))
    for s in (ram, disk):
        fill(s)
        s.update([Remove("b"), Put("c", b"5")])
    assert ram.pairs("") == disk.pairs("")
    assert ram.checksum() == disk.checksum()
    disk.close()
    # durability
    disk2 = DiskKvStore(os.fspath(tmp_path / "kv.sqlite"))
    assert disk2.pairs("") == ram.pairs("")


def test_mirror_overlay_and_rollback():
    base = RamKvStore()
    fill(base)
    fork = base.mirror()
    fork.update([Put("aa", b"X"), Remove("ab"), Put("new", b"N")])
    # fork sees the overlay
    assert fork.get("aa") == b"X"
    assert fork.get("ab") is None
    assert fork.get("new") == b"N"
    assert fork.pairs("a") == [("aa", b"X")]
    # base untouched
    assert base.get("aa") == b"1"
    rollback = fork.rollback_ops()
    # commit, then roll back — database returns to its original state
    before = base.checksum()
    base.update(fork.to_ops())
    assert base.get("aa") == b"X"
    base.update(rollback)
    assert base.checksum() == before


def test_nested_mirror():
    base = RamKvStore()
    fill(base)
    f1 = base.mirror()
    f1.update([Put("aa", b"X")])
    f2 = f1.mirror()
    f2.update([Put("aa", b"Y"), Put("ab", b"Z")])
    assert f2.get("aa") == b"Y"
    assert f1.get("aa") == b"X"
    assert base.get("aa") == b"1"

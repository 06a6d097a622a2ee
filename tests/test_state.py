"""ZK state-machine tests (model: reference src/zk/test/mod.rs:43-287 —
SumHasher membership arithmetic, root evolution, default-pruning symmetry)."""

import pytest

from bazuka_tpu.db import Put, RamKvStore, keys
from bazuka_tpu.utils import ser
from bazuka_tpu.zk.poseidon_host import PoseidonHasher
from bazuka_tpu.zk.state import (
    SCALAR,
    ListModel,
    StateManager,
    Struct,
    ZkCompressedState,
    ZkContract,
    ZkStateBuilder,
    compress_default,
    loc_parse,
    loc_str,
    locate,
)


class SumHasher:
    """hash = sum of inputs — makes Merkle updates checkable by arithmetic
    (reference: src/zk/test/mod.rs:7-18)."""

    MAX_ARITY = 16

    @staticmethod
    def hash(vals):
        from bazuka_tpu.fields.host import FR_MODULUS

        return sum(vals) % FR_MODULUS


C0 = "0x" + "00" * 32


def install_contract(db, model, hasher):
    db.update(
        [
            Put(
                keys.contract(C0),
                ser.dumps(
                    ZkContract(
                        initial_state=ZkCompressedState.empty(model, hasher),
                        state_model=model,
                    )
                ),
            )
        ]
    )


def test_locate_and_compress_default():
    model = Struct([SCALAR, ListModel(2, SCALAR)])
    assert locate(model, ()) == model
    assert locate(model, (0,)) == SCALAR
    assert locate(model, (1, 15)) == SCALAR
    with pytest.raises(Exception):
        locate(model, (1, 16))
    with pytest.raises(Exception):
        locate(model, (2,))
    # SumHasher default of a list of zeros is 0; struct default = 0
    assert compress_default(model, SumHasher) == 0
    # Poseidon default is nonzero and cached
    d1 = compress_default(ListModel(3, SCALAR), PoseidonHasher)
    d2 = compress_default(ListModel(3, SCALAR), PoseidonHasher)
    assert d1 == d2 != 0


def test_loc_str_roundtrip():
    for loc in [(), (0,), (1, 255), (62, 0), (0x21, 1)]:
        assert loc_parse(loc_str(loc)) == loc
    assert loc_str((62, 0)) == "3e_0"


def test_zk_list_membership_proof():
    # reference: src/zk/test/mod.rs:44-71
    model = Struct([SCALAR, ListModel(4, SCALAR)])
    b = ZkStateBuilder(model, SumHasher)
    for i in range(256):
        b.batch_set({(1, i): i})
    for i in range(0, 256, 17):
        accum = i
        for part in b.prove((1,), i):
            accum += sum(part)
        assert accum % (2**64) == 32640  # sum(0..255)


def test_state_manager_scalar():
    db = RamKvStore()
    mgr = StateManager(SumHasher)
    install_contract(db, SCALAR, SumHasher)
    mgr.update_contract(db, C0, {(): 0xF}, 1)
    assert mgr.get_data(db, C0, ()) == 0xF
    assert mgr.root(db, C0).state_hash == 0xF
    assert mgr.height_of(db, C0) == 1


def test_state_manager_struct_sum():
    db = RamKvStore()
    mgr = StateManager(SumHasher)
    model = Struct([SCALAR, SCALAR])
    install_contract(db, model, SumHasher)
    mgr.update_contract(db, C0, {(0,): 0xF}, 1)
    assert mgr.root(db, C0).state_hash == 0xF
    mgr.update_contract(db, C0, {(1,): 0xF0}, 2)
    assert mgr.root(db, C0).state_hash == 0xFF
    mgr.update_contract(db, C0, {(0,): 0xF00}, 3)
    assert mgr.root(db, C0).state_hash == 0xFF0
    assert mgr.root(db, C0).state_size == 2
    mgr.update_contract(db, C0, {(0,): 0, (1,): 0}, 4)
    assert mgr.root(db, C0).state_hash == 0
    assert mgr.root(db, C0).state_size == 0


def test_state_manager_list_poseidon_pruning_symmetry():
    # reference: src/zk/test/mod.rs:177-287 — root must return exactly to
    # the empty root and the DB must not leak aux nodes.
    db = RamKvStore()
    mgr = StateManager(PoseidonHasher)
    model = ListModel(3, Struct([SCALAR, SCALAR]))
    install_contract(db, model, PoseidonHasher)
    empty_root = mgr.root(db, C0)
    baseline_keys = {k for k, _ in db.pairs("")}

    mgr.update_contract(db, C0, {(62, 0): 0xF00000}, 1)
    r1 = mgr.root(db, C0)
    assert r1.state_hash != empty_root.state_hash
    assert r1.state_size == 1

    mgr.update_contract(db, C0, {(33, 0): 0xF}, 2)
    mgr.update_contract(db, C0, {(33, 1): 0xF0}, 3)
    assert mgr.root(db, C0).state_size == 3
    mgr.update_contract(db, C0, {(33, 0): 0xF00}, 4)
    assert mgr.get_data(db, C0, (33, 0)) == 0xF00
    assert mgr.get_data(db, C0, (33, 1)) == 0xF0
    # proofs verify against the root by recomputation
    proof = mgr.prove(db, C0, (), 33)
    leaf = PoseidonHasher.hash([0xF00, 0xF0])
    ind = 33
    acc = leaf
    for part in proof:
        sibs = list(part)
        pos = ind % 4
        row = sibs[:pos] + [acc] + sibs[pos:]
        acc = PoseidonHasher.hash(row)
        ind //= 4
    assert acc == mgr.root(db, C0).state_hash

    mgr.update_contract(db, C0, {(33, 0): 0, (33, 1): 0}, 5)
    r_back = mgr.root(db, C0)
    assert r_back.state_hash == r1.state_hash
    assert r_back.state_size == 1
    mgr.update_contract(db, C0, {(62, 0): 0}, 6)
    final = mgr.root(db, C0)
    assert final.state_hash == empty_root.state_hash
    assert final.state_size == 0
    # every aux/value key pruned; only root/height metadata may remain
    leaked = {
        k
        for k, _ in db.pairs("")
        if k not in baseline_keys
        and not k.endswith("-RT")
        and not k.endswith("-HGT")
    }
    assert leaked == set()


def test_set_data_unchanged_value_is_noop():
    db = RamKvStore()
    mgr = StateManager(SumHasher)
    model = ListModel(2, SCALAR)
    install_contract(db, model, SumHasher)
    mgr.update_contract(db, C0, {(3,): 7}, 1)
    before = db.checksum()
    root, diff = mgr.set_data(db, C0, (3,), 7)
    assert diff == 0
    assert db.checksum() == before
    assert root == mgr.root(db, C0).state_hash

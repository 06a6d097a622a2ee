"""Poseidon bit-exactness: the reference's 16 golden vectors
(reference: src/zk/poseidon/mod.rs:115-149) for the host implementation and
the batched kernel (numpy twin across all widths; one jitted JAX parity
check, since the two backends share the kernel code path)."""

import random

import numpy as np
import pytest

from bazuka_tpu.fields.host import FR_MODULUS
from bazuka_tpu.ops.poseidon import poseidon_batch
from bazuka_tpu.zk.poseidon_host import MAX_ARITY, poseidon

# poseidon([0..arity-1]) for arity = 1..16 (reference golden vectors)
GOLDEN = [
    "27570695323925995271701303589514430472678239829854264417883970952440292573348",
    "6587584068506488869767403662460111870851709789694140241572542699619538605403",
    "11065162352055215342882956665028806373710857144056793315618843991574034541745",
    "27235437669367044799899874028200860893259633691548428184978833555844239099210",
    "39122459949963443953695513827515422590145971775731164693081784821001500765271",
    "14822541353598610072073758561600133199190898904019472753356348939736178856242",
    "32119039894111509393883349238591117345166479914896997011437787663480858229324",
    "43492451727584886720328582747486156090763899250669626113572962177392830153672",
    "23782521420058920239581486714235942233162905749917547091367129332109148150964",
    "1950261058989975858181381159018748926889722679795466088362775920975943983890",
    "47763254094198808066374497304963224993617822320088130264863862435119574697678",
    "44035521596650126254580286193043646937530018324533162959282567836364656349620",
    "45248278075433906869650374149660178834237900630357739057386839430392516698709",
    "30558481537294127342952125056358924225581206938869947160862017954746718634085",
    "10702554392571105609953066033536365418563149392782994983402406449789876497692",
    "34319425623279664398659085846739236990635100324667226409415519671072072962346",
]


def test_host_golden_vectors():
    for arity in range(1, MAX_ARITY + 1):
        got = poseidon(list(range(arity)))
        assert got == int(GOLDEN[arity - 1]), f"arity {arity}"


def test_kernel_golden_vectors_np():
    """np-kernel golden vectors at the protocol's live arities (4 = the
    quad-tree merge, 5 = account leaves, 1/16 = the width extremes);
    the host twin covers all 16 above, and the remaining widths run in
    the slow tier — each arity is a separate kernel build, and all 16
    cost ~40 s of every default run."""
    for arity in (1, 4, 5, 16):
        inp = np.array([list(range(arity))], dtype=object)
        got = poseidon_batch(inp, backend="np")
        assert int(got[0]) == int(GOLDEN[arity - 1]), f"arity {arity}"


@pytest.mark.slow
def test_kernel_golden_vectors_np_all_arities():
    for arity in range(1, MAX_ARITY + 1):
        inp = np.array([list(range(arity))], dtype=object)
        got = poseidon_batch(inp, backend="np")
        assert int(got[0]) == int(GOLDEN[arity - 1]), f"arity {arity}"


def test_hash_reflects_changes():
    # reference: src/zk/poseidon/mod.rs:103-112
    for arity in (1, 4, 16):
        vals = [0] * arity
        original = poseidon(vals)
        for i in range(arity):
            vals[i] = 1
            assert poseidon(vals) != original


@pytest.mark.parametrize("arity", [2, 4, 5, 7])
def test_kernel_vs_host_random_np(arity):
    rng = random.Random(arity)
    B = 5
    vals = [[rng.randrange(FR_MODULUS) for _ in range(arity)] for _ in range(B)]
    got = poseidon_batch(np.array(vals, dtype=object), backend="np")
    want = [poseidon(row) for row in vals]
    assert [int(v) for v in got] == want


def test_kernel_jax_parity():
    """Jitted JAX kernel == numpy twin == host, at the 4-ary tree width."""
    rng = random.Random(99)
    vals = [[rng.randrange(FR_MODULUS) for _ in range(4)] for _ in range(8)]
    arr = np.array(vals, dtype=object)
    got_jax = poseidon_batch(arr, backend="jax")
    want = [poseidon(row) for row in vals]
    assert [int(v) for v in got_jax] == want

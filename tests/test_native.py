"""Native C++ Poseidon engine: bit-exact vs the pure-Python twin and the
reference golden vectors; batch API; graceful fallback."""

import time

import pytest

from bazuka_tpu import native
from bazuka_tpu.zk.poseidon_host import poseidon, poseidon_python


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no native toolchain available")
    return lib


def test_native_matches_python(lib):
    import numpy as np

    rng = np.random.default_rng(0)
    for arity in (1, 2, 4, 5, 7, 16):
        vals = [int(x) for x in rng.integers(0, 2**63, size=arity)]
        assert native.native_poseidon(vals) == poseidon_python(vals)
    # edge values
    from bazuka_tpu.fields.host import FR_MODULUS

    assert native.native_poseidon([0]) == poseidon_python([0])
    assert native.native_poseidon([FR_MODULUS - 1] * 4) == poseidon_python(
        [FR_MODULUS - 1] * 4
    )


def test_native_golden_vector(lib):
    # reference golden vectors (src/zk/poseidon/mod.rs:115-149) must hold
    # through the native path: arity k hashes [0, 1, ..., k-1]
    assert poseidon([0]) == int(
        "27570695323925995271701303589514430472678239829854264417883970952440292573348"
    )
    assert poseidon([0, 1]) == int(
        "6587584068506488869767403662460111870851709789694140241572542699619538605403"
    )
    assert poseidon([0, 1, 2, 3, 4]) == int(
        "39122459949963443953695513827515422590145971775731164693081784821001500765271"
    )


def test_native_batch(lib):
    flat = list(range(1, 13))  # 3 hashes of arity 4
    got = native.native_poseidon_batch(4, flat)
    assert got == [
        poseidon_python(flat[0:4]),
        poseidon_python(flat[4:8]),
        poseidon_python(flat[8:12]),
    ]


def test_native_is_faster(lib):
    vals = [123456789, 987654321, 555, 777]
    t0 = time.perf_counter()
    for i in range(200):
        native.native_poseidon([vals[0] + i] + vals[1:])
    native_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(20):
        poseidon_python([vals[0] + i] + vals[1:])
    python_dt = (time.perf_counter() - t0) * 10
    assert native_dt < python_dt  # typically ~100x

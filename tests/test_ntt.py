"""NTT tests: host vs naive DFT, TPU kernel vs host, roundtrips, coset."""

import numpy as np
import pytest

from bazuka_tpu.fields.host import FR_GENERATOR, FR_MODULUS
from bazuka_tpu.fields.limbs import fr_field
from bazuka_tpu.ops import ntt as nttm

P = FR_MODULUS


def rand_vals(n, seed=0):
    rng = np.random.default_rng(seed)
    return [int(x) for x in rng.integers(0, 2**63, size=n)]


def test_root_of_unity():
    for log_n in (1, 4, 10):
        w = nttm.root_of_unity(log_n)
        assert pow(w, 1 << log_n, P) == 1
        assert pow(w, 1 << (log_n - 1), P) != 1
    with pytest.raises(ValueError):
        nttm.root_of_unity(33)


def test_host_matches_dft():
    vals = rand_vals(16)
    assert nttm.ntt_host(vals) == nttm.dft_host(vals)


def test_host_roundtrip():
    vals = rand_vals(64, 1)
    assert nttm.ntt_host(nttm.ntt_host(vals), inverse=True) == [v % P for v in vals]


@pytest.mark.parametrize("backend", ["np", "jax"])
@pytest.mark.parametrize("log_n", [4, 8])
def test_kernel_matches_host(backend, log_n):
    vals = rand_vals(1 << log_n, log_n)
    got = list(nttm.ntt(vals, backend=backend))
    assert got == nttm.ntt_host(vals)
    got_inv = list(nttm.ntt(vals, inverse=True, backend=backend))
    assert got_inv == nttm.ntt_host(vals, inverse=True)


def test_coset_roundtrip_and_vanishing():
    # Coset evaluation of Z(x) = x^n - 1 over gH is g^n*w^{ni} - 1 != 0
    backend = "np"
    F = fr_field(backend)
    log_n, n = 4, 16
    vals = rand_vals(n, 7)
    enc = F.xp.asarray(F.encode(np.array(vals, dtype=object)))
    back = F.decode(np.asarray(nttm.coset_intt_mont(nttm.coset_ntt_mont(enc, backend), backend)))
    assert list(back) == [v % P for v in vals]
    # polynomial multiplication via coset: (x+1)*(x+2) = x^2+3x+2
    a = [1, 1] + [0] * 14
    b = [2, 1] + [0] * 14
    ea = nttm.coset_ntt_mont(F.xp.asarray(F.encode(np.array(a, dtype=object))), backend)
    eb = nttm.coset_ntt_mont(F.xp.asarray(F.encode(np.array(b, dtype=object))), backend)
    prod = F.decode(np.asarray(nttm.coset_intt_mont(F.mont_mul(ea, eb), backend)))
    assert list(prod[:4]) == [2, 3, 1, 0]


@pytest.mark.parametrize("inverse", [False, True])
def test_device_built_tables_match_host(inverse):
    """The twiddle/coset tables are built ON DEVICE via bit-decomposition
    exponentiation (_pow_builder) so d=2^24 never materializes 16M-entry
    host lists or pins 4 GB of cached tables (round-4 OOM fix).  Check
    bit-exactness against the straight host computation."""
    backend = "np"
    F = fr_field(backend)
    log_n = 9
    n = 1 << log_n
    w = nttm.root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, P)
    expect = []
    for s in range(log_n):
        half = 1 << s
        w_m = pow(w, n // (2 * half), P)
        acc = 1
        for _ in range(half):
            expect.append(acc)
            acc = acc * w_m % P
    got = F.decode(np.asarray(nttm._stage_twiddles(log_n, inverse, backend)))
    assert [int(x) for x in got] == expect

    g = FR_GENERATOR if not inverse else pow(FR_GENERATOR, -1, P)
    got_cs = F.decode(np.asarray(nttm._coset_scale(log_n, inverse, backend)))
    assert [int(x) for x in got_cs] == [pow(g, i, P) for i in range(n)]


def test_table_cache_policy():
    """Small tables are cached (per-process); above _TABLE_CACHE_MAX_LOG_N
    they are rebuilt per call so HBM is not pinned at 2^22+."""
    a = nttm._stage_twiddles(8, False, "np")
    b = nttm._stage_twiddles(8, False, "np")
    assert a is b


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("log_n", [5, 8])
def test_fourstep_matches_host(inverse, log_n):
    """The chunked single-chip Bailey four-step (big-domain path of
    ntt_mont, d >= 2^23 — the mainnet b256 prover's transform) must be
    bit-exact vs the host oracle.  Forced at toy sizes via the module
    thresholds; odd and even log_n cover the A != B split."""
    import bazuka_tpu.ops.ntt as mod

    F = fr_field("jax")
    old_min, old_chunk = mod._FOURSTEP_MIN_LOG_N, mod._FOURSTEP_CHUNK_LANES
    try:
        mod._FOURSTEP_MIN_LOG_N = 4
        mod._FOURSTEP_CHUNK_LANES = 1 << 6  # several chunks per pass
        vals = rand_vals(1 << log_n, log_n + (7 if inverse else 0))
        enc = F.xp.asarray(F.encode(np.array(vals, dtype=object)))
        got = [int(v) for v in
               F.decode(np.asarray(mod.ntt_mont(enc, inverse, "jax")))]
        assert got == mod.ntt_host(vals, inverse=inverse)
    finally:
        mod._FOURSTEP_MIN_LOG_N = old_min
        mod._FOURSTEP_CHUNK_LANES = old_chunk

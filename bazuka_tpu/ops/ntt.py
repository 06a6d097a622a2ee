"""NTT / iNTT over BLS12-381 Fr for QAP reduction.

Fr has 2-adicity 32 (p - 1 = 2^32 * t), generator 7 — the evaluation
domains of the Groth16 prover (reference: bellman's EvaluationDomain,
consumed via src/mpn/circuits proving; SURVEY.md §2.2).

TPU design: decimation-in-time radix-2 with a one-shot bit-reversal
gather, then log2(N) vectorized butterfly stages.  Each stage reshapes
the (N, 16)-limb Montgomery tensor to (groups, 2, half, 16) so the
butterfly `(a, b) -> (a + w b, a - w b)` is a single batched Montgomery
multiply + add/sub over VPU lanes; per-stage twiddles are host-precomputed
Montgomery constants.  No data-dependent control flow; one jit per size.

Host twin (`ntt_host`) is the bit-exactness anchor, checked against a
naive O(N^2) DFT in tests.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.host import FR_GENERATOR, FR_MODULUS, FR_TWO_ADICITY
from ..fields.limbs import fr_field

P = FR_MODULUS


@functools.cache
def root_of_unity(log_n: int) -> int:
    """Primitive 2^log_n-th root of unity in Fr."""
    if log_n > FR_TWO_ADICITY:
        raise ValueError(f"domain 2^{log_n} exceeds Fr 2-adicity {FR_TWO_ADICITY}")
    return pow(FR_GENERATOR, (P - 1) >> log_n, P)


# ---------------------------------------------------------------- host twin


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def ntt_host(values, inverse: bool = False) -> list:
    """In-order radix-2 NTT/iNTT on Python ints (ground truth)."""
    n = len(values)
    assert n & (n - 1) == 0, "size must be a power of two"
    log_n = n.bit_length() - 1
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, P)
    a = [values[i] % P for i in _bit_reverse_indices(n)]
    half = 1
    while half < n:
        w_m = pow(w, n // (2 * half), P)
        for start in range(0, n, 2 * half):
            wj = 1
            for j in range(half):
                u = a[start + j]
                v = a[start + j + half] * wj % P
                a[start + j] = (u + v) % P
                a[start + j + half] = (u - v) % P
                wj = wj * w_m % P
        half *= 2
    if inverse:
        n_inv = pow(n, -1, P)
        a = [x * n_inv % P for x in a]
    return a


def dft_host(values) -> list:
    """Naive O(N^2) DFT — test oracle only."""
    n = len(values)
    w = root_of_unity(n.bit_length() - 1)
    return [
        sum(values[j] * pow(w, i * j, P) for j in range(n)) % P for i in range(n)
    ]


# ---------------------------------------------------------------- TPU kernel


# Above this size, twiddle/coset tables are rebuilt on device per call
# instead of cached: at 2^24 the four tables (fwd/inv twiddles, fwd/inv
# coset scale) would pin 4 GB of HBM for the whole process lifetime —
# a third of the chip — while a rebuild is ~log_n bulk Montgomery
# multiplies (HBM-bound, well under a second each).
_TABLE_CACHE_MAX_LOG_N = 21


@functools.cache
def _pow_builder(log_n: int, backend: str):
    """Jitted builder: (m,) int64 exponents + (log_n, 16) Montgomery
    powers w^(2^k) -> (m, 16) Montgomery w^e, via the bit decomposition
    e = Σ bit_k(e)·2^k (log_n full-width masked multiplies — no host
    per-element loop, no giant upload)."""
    F = fr_field(backend)
    one = F.const_mont(1)

    def run(e, wp):
        acc = F.xp.broadcast_to(one[None], (e.shape[0], F.n))
        for k in range(log_n):
            bit = ((e >> k) & 1).astype(F.xp.uint32)
            factor = F.xp.where(bit[:, None] != 0, wp[k][None], one[None])
            acc = F.mont_mul(acc, factor)
        return acc

    if backend == "jax":
        import jax

        run = jax.jit(run)
    return run


def _w_pow_table(w: int, log_n: int, backend: str):
    """(log_n, 16) Montgomery limbs of w^(2^k), k in 0..log_n-1."""
    F = fr_field(backend)
    ws, acc = [], w % P
    for _ in range(log_n):
        ws.append(acc)
        acc = acc * acc % P
    return F.xp.asarray(F.encode(np.array(ws, dtype=object)))


def _stage_twiddle_exponents(log_n: int) -> np.ndarray:
    """(n-1,) exponents e(r) such that packed twiddle row r = w^e(r):
    stage s (half=2^s, w_m = w^(n >> (s+1))) owns rows
    [2^s - 1, 2^(s+1) - 1) holding w_m^0..w_m^(half-1)."""
    n = 1 << log_n
    r = np.arange(1, n, dtype=np.int64)  # r = packed row + 1 in [1, n)
    s = np.floor(np.log2(r)).astype(np.int64)  # stage of row r-1
    j = r - (np.int64(1) << s)
    return j * (n >> (s + 1))


def _build_stage_twiddles(log_n: int, inverse: bool, backend: str):
    F = fr_field(backend)
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, P)
    e = F.xp.asarray(_stage_twiddle_exponents(log_n))
    return _pow_builder(log_n, backend)(e, _w_pow_table(w, log_n, backend))


@functools.cache
def _stage_twiddles_cached(log_n: int, inverse: bool, backend: str):
    return _build_stage_twiddles(log_n, inverse, backend)


def _stage_twiddles(log_n: int, inverse: bool, backend: str):
    """All stages' Montgomery twiddles PACKED in one (n-1, 16) array,
    passed to the jitted stage loop as a RUNTIME ARGUMENT — embedding
    them as program constants put 268 MB in the 2^22 module, which
    broke the compile-RPC payload limit and bloats the persistent
    cache.  Cached on device for small sizes, rebuilt per call above
    _TABLE_CACHE_MAX_LOG_N (see there)."""
    if log_n <= _TABLE_CACHE_MAX_LOG_N:
        return _stage_twiddles_cached(log_n, inverse, backend)
    return _build_stage_twiddles(log_n, inverse, backend)


@functools.cache
def _rev_dev(log_n: int, backend: str):
    F = fr_field(backend)
    return F.xp.asarray(_bit_reverse_indices(1 << log_n))


@functools.cache
def _ntt_fn(log_n: int, inverse: bool, backend: str):
    F = fr_field(backend)
    n = 1 << log_n
    n_inv_mont = F.const_mont(pow(n, -1, P)) if inverse else None

    def run(x, rev, tw_cat):
        """x: (n, 16) Montgomery limbs -> transformed (n, 16).
        rev: (n,) bit-reversal gather; tw_cat: (n-1, 16) packed
        twiddles (see _stage_twiddles)."""
        a = x[rev]
        for s in range(log_n):
            half = 1 << s
            tw_s = tw_cat[half - 1 : 2 * half - 1]
            a = a.reshape(n // (2 * half), 2, half, F.n)
            u = a[:, 0]
            v = F.mont_mul(a[:, 1], tw_s[None])
            a = F.xp.stack([F.add(u, v), F.sub(u, v)], axis=1)
        a = a.reshape(n, F.n)
        if inverse:
            a = F.mont_mul(a, n_inv_mont[None])
        return a

    if backend == "jax":
        import jax

        # donate x: every caller consumes its input (h-phase pipeline),
        # and at d = 2^24 each (d, 16) tensor is 1 GiB of HBM — aliasing
        # in/out keeps the sequential h computation inside the chip.
        # (JAX silently copies if the buffer is still referenced.)
        run = jax.jit(run, donate_argnums=0)
    return run


def ntt_mont(x, inverse: bool = False, backend: str = "jax"):
    """(n, 16) Montgomery limbs -> NTT'd limbs, bit-exact vs ntt_host.
    jax backend DONATES x (see _ntt_fn)."""
    log_n = x.shape[0].bit_length() - 1
    return _ntt_fn(log_n, inverse, backend)(
        x, _rev_dev(log_n, backend), _stage_twiddles(log_n, inverse, backend)
    )


@functools.cache
def _ntt_batched_fn(log_n: int, inverse: bool, backend: str, scale: bool):
    """Batched stage loop over a (B, n, 16) tensor — the local-transform
    building block of the Bailey four-step multi-chip NTT
    (parallel.ntt_four_step).  `scale` applies the 1/n factor (the
    four-step inverse applies a single 1/N at the end instead).
    Tables arrive as runtime args (see _stage_twiddles)."""
    F = fr_field(backend)
    n = 1 << log_n
    n_inv_mont = F.const_mont(pow(n, -1, P)) if (inverse and scale) else None

    def run(x, rev, tw_cat):
        """x: (B, n, 16) Montgomery limbs, transformed along axis 1."""
        B = x.shape[0]
        a = x[:, rev]
        for s in range(log_n):
            half = 1 << s
            tw_s = tw_cat[half - 1 : 2 * half - 1]
            a = a.reshape(B, n // (2 * half), 2, half, F.n)
            u = a[:, :, 0]
            v = F.mont_mul(a[:, :, 1], tw_s[None, None])
            a = F.xp.stack([F.add(u, v), F.sub(u, v)], axis=2)
        a = a.reshape(B, n, F.n)
        if n_inv_mont is not None:
            a = F.mont_mul(a, n_inv_mont[None, None])
        return a

    return run


def ntt_mont_batched(x, inverse: bool = False, backend: str = "jax",
                     scale: bool = True):
    """(B, n, 16) Montgomery limbs -> per-row NTT along axis 1."""
    log_n = x.shape[1].bit_length() - 1
    return _ntt_batched_fn(log_n, inverse, backend, scale)(
        x, _rev_dev(log_n, backend), _stage_twiddles(log_n, inverse, backend)
    )


def ntt(values, inverse: bool = False, backend: str = "jax") -> np.ndarray:
    """Convenience host API on int arrays."""
    F = fr_field(backend)
    enc = F.xp.asarray(F.encode(np.array(list(values), dtype=object)))
    out = ntt_mont(enc, inverse, backend)
    return F.decode(np.asarray(out))


# -------------------------------------------------- coset transforms


def _build_coset_scale(log_n: int, inverse: bool, backend: str):
    F = fr_field(backend)
    n = 1 << log_n
    g = FR_GENERATOR if not inverse else pow(FR_GENERATOR, -1, P)
    e = F.xp.asarray(np.arange(n, dtype=np.int64))
    return _pow_builder(log_n, backend)(e, _w_pow_table(g, log_n, backend))


@functools.cache
def _coset_scale_cached(log_n: int, inverse: bool, backend: str):
    return _build_coset_scale(log_n, inverse, backend)


def _coset_scale(log_n: int, inverse: bool, backend: str):
    """Montgomery powers g^i (or g^-i) of the Fr multiplicative generator,
    for evaluating on / interpolating from the coset gH (bellman's
    coset_fft semantics for the h(x) computation).  Device-built (see
    _pow_builder); cached only at small sizes (_TABLE_CACHE_MAX_LOG_N)."""
    if log_n <= _TABLE_CACHE_MAX_LOG_N:
        return _coset_scale_cached(log_n, inverse, backend)
    return _build_coset_scale(log_n, inverse, backend)


def coset_ntt_mont(x, backend: str = "jax"):
    """Evaluate polynomial (coeff form) over the coset gH."""
    F = fr_field(backend)
    log_n = x.shape[0].bit_length() - 1
    scaled = F.mont_mul(x, _coset_scale(log_n, False, backend))
    return ntt_mont(scaled, False, backend)


def coset_intt_mont(x, backend: str = "jax"):
    """Interpolate from coset-gH evaluations back to coefficients."""
    F = fr_field(backend)
    log_n = x.shape[0].bit_length() - 1
    coeffs = ntt_mont(x, True, backend)
    return F.mont_mul(coeffs, _coset_scale(log_n, True, backend))

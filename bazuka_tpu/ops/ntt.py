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
    per-element loop, no giant upload).

    log_n <= 31: without jax x64 the device exponent array is int32, so
    exponents (< n) overflow at log_n = 32 — Fr's 2-adicity admits 2^32
    domains but nothing in the prover needs one (d <= 2^24)."""
    assert log_n <= 31, "int32 exponent arithmetic caps domains at 2^31"
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
        # NOTE on TPU donation invalidates the input REGARDLESS of other
        # Python references (later use raises "Array has been deleted");
        # only backends without donation support (the CPU the tests run
        # on) silently copy instead — CPU CI cannot catch a reuse bug.
        run = jax.jit(run, donate_argnums=0)
    return run


def ntt_mont(x, inverse: bool = False, backend: str = "jax"):
    """(n, 16) Montgomery limbs -> NTT'd limbs, bit-exact vs ntt_host.

    DONATION CONTRACT (jax backend): x is donated — on TPU the input
    array is INVALID after this call even if other Python references
    hold it (reuse raises "Array has been deleted"; the CPU backend
    silently copies, so tests cannot catch a reuse).  Callers that need
    x afterwards must pass a copy (x + 0 under jit, or jnp.copy).

    Above _FOURSTEP_MIN_LOG_N the
    monolithic stage-loop program is replaced by the chunked Bailey
    four-step (see _ntt_mont_fourstep): the 24-stage program's peak
    working set at 2^24 is most of the chip, and with any other proof
    state resident it OOMs (round-4 b256)."""
    log_n = x.shape[0].bit_length() - 1
    if backend == "jax" and log_n >= _FOURSTEP_MIN_LOG_N:
        return _ntt_mont_fourstep(x, log_n, inverse, backend)
    return _ntt_fn(log_n, inverse, backend)(
        x, _rev_dev(log_n, backend), _stage_twiddles(log_n, inverse, backend)
    )


# ------------------------------------------ single-chip four-step NTT
#
# Bailey decomposition, N = A*B with n = A*n2 + n1, k = B*k1 + k2:
#   X[B*k1+k2] = Σ_{n1} w_A^{n1*k1} · ( w_N^{n1*k2} · Σ_{n2} x[A*n2+n1]
#                                        · w_B^{n2*k2} )
# i.e. reshape to (B, A), transpose, row-NTT_B, twiddle by w_N^{n1*k2},
# transpose, row-NTT_A, transpose back.  Every row-NTT runs over a
# CHUNK of rows (a few hundred MB working set), so peak HBM is bounded
# by ~3 full-tensor buffers regardless of N — the monolithic program's
# peak grows with the unrolled stage count.  Same math as the multichip
# ntt_four_step (parallel.__init__), with the mesh axis replaced by a
# host chunk loop on one chip.

_FOURSTEP_MIN_LOG_N = 23
_FOURSTEP_CHUNK_LANES = 1 << 22  # rows*cols lanes per dispatch (~268 MB)


@functools.cache
def _transpose_fn(backend: str):
    import jax

    return jax.jit(lambda a: a.transpose(1, 0, 2), donate_argnums=0)


@functools.cache
def _row_ntt_jit(log_m: int, inverse: bool, backend: str):
    """One jitted program per row-chunk: the unscaled batched stage loop
    (tables as runtime args, input donated)."""
    import jax

    fn = _ntt_batched_fn(log_m, inverse, backend, scale=False)
    return jax.jit(fn, donate_argnums=0)


@functools.cache
def _twiddle_rows_fn(log_n: int, log_B: int, C: int, backend: str):
    """jitted: rows chunk (C, B, 16) * w_N^{(lo+r)*k2} for r in [0, C).
    Exponent powers via bit decomposition against the (log_n, 16)
    w_N^(2^k) table (runtime arg, inverse-agnostic)."""
    F = fr_field(backend)
    import jax
    import jax.numpy as jnp

    one = F.const_mont(1)
    B = 1 << log_B

    assert log_n <= 31, "int32 exponent arithmetic caps domains at 2^31"

    def run(chunk, lo, wp):
        # exponent products r*k2 < A*B = N: without x64 the arange
        # arithmetic is int32, so this is safe for log_n <= 31 only
        # (asserted above; the prover's domains cap at 2^24)
        r = lo + jnp.arange(C, dtype=jnp.int64)
        e = (r[:, None] * jnp.arange(B, dtype=jnp.int64)[None, :]) % (
            1 << log_n
        )
        acc = jnp.broadcast_to(one[None, None], (C, B, F.n))
        for k in range(log_n):
            bit = ((e >> k) & 1).astype(jnp.uint32)
            factor = jnp.where(bit[..., None] != 0, wp[k][None, None],
                               one[None, None])
            acc = F.mont_mul(acc, factor)
        return F.mont_mul(chunk, acc)

    return jax.jit(run, donate_argnums=0)


def _ntt_mont_fourstep(x, log_n: int, inverse: bool, backend: str):
    F = fr_field(backend)
    xp = F.xp
    log_A = (log_n + 1) // 2
    log_B = log_n - log_A
    A, B = 1 << log_A, 1 << log_B
    w = root_of_unity(log_n)
    if inverse:
        w = pow(w, -1, P)
    wp = _w_pow_table(w, log_n, backend)
    tr = _transpose_fn(backend)

    def chunked_rows(x2d, fn):
        R, m = x2d.shape[0], x2d.shape[1]
        C = max(1, min(R, _FOURSTEP_CHUNK_LANES // m))
        outs = [fn(x2d[lo : lo + C], lo) for lo in range(0, R, C)]
        return outs[0] if len(outs) == 1 else xp.concatenate(outs, axis=0)

    def row_ntt(chunk, log_m):
        return _row_ntt_jit(log_m, inverse, backend)(
            chunk, _rev_dev(log_m, backend),
            _stage_twiddles(log_m, inverse, backend),
        )

    # (N,16) -> (B, A, 16) -> T -> (A, B, 16): rows n1, cols n2->k2
    y = tr(x.reshape(B, A, F.n))
    del x
    # row-NTT_B + twiddle w_N^{n1*k2}, one chunk of rows at a time
    tw = None

    def step1(chunk, lo):
        nonlocal tw
        out = row_ntt(chunk, log_B)
        if tw is None:
            tw = _twiddle_rows_fn(log_n, log_B, out.shape[0], backend)
        return tw(out, lo, wp)

    y = chunked_rows(y, step1)
    # T -> (B, A, 16): rows k2, cols n1; row-NTT_A
    y = tr(y)
    y = chunked_rows(y, lambda c, lo: row_ntt(c, log_A))
    # W[k2, k1] -> T -> (A, B)[k1, k2] -> (N,)
    y = tr(y).reshape(1 << log_n, F.n)
    if inverse:
        n_inv = F.const_mont(pow(1 << log_n, -1, P))
        y = F.mont_mul(y, n_inv[None])
    return y


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

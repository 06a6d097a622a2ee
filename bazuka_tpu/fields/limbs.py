"""TPU-native multi-limb prime-field engine.

Big integers are represented as little-endian 16-bit limbs held in `uint32`
lanes, shape `(..., n_limbs)`.  All arithmetic is branch-free, static-shape
and vectorizes over arbitrary leading (batch) dimensions, which is how every
hot kernel in this framework (Poseidon, NTT, MSM, witness generation) maps
onto the 8x128 VPU: the batch rides the vector lanes, the limb loop is a
short static unroll that XLA fuses.

Why 16-bit limbs in 32-bit lanes: a 16x16 product fits a uint32 exactly, and
schoolbook column accumulation of up to 2*n partial products (n <= 24 for
381-bit Fp) stays < 2^22, so no intermediate carries are needed — one carry
sweep per multiplication.  Montgomery reduction (R = 2^(16*n)) keeps every
operation multiplication-shaped.

The engine is backend-generic: the same code runs on `jax.numpy` (the TPU
path, used under `jit`) and on plain `numpy` (fast host twin used by tests
and by sequential host-side logic).  Bit-exactness of the two paths is
asserted in tests.

Replaces the reference's `ff`-derived 4x64 Montgomery arithmetic
(reference: src/zk/mod.rs:202-206) with a layout chosen for the TPU VPU
rather than 64-bit scalar CPUs.
"""

from __future__ import annotations

import functools

import numpy as np

MASK = np.uint32(0xFFFF)
W = 16  # bits per limb


def int_to_limbs(x: int, n: int) -> np.ndarray:
    """Python int -> (n,) uint32 array of 16-bit limbs (little-endian)."""
    return np.array([(x >> (W * i)) & 0xFFFF for i in range(n)], dtype=np.uint32)


def limbs_to_int(a) -> int:
    """(n,) limb array -> Python int."""
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(v) << (W * i) for i, v in enumerate(a))


def ints_to_array(xs, n: int) -> np.ndarray:
    """List/array of ints -> (..., n) uint32 limb array.

    Bytes-based fast path: int.to_bytes + one frombuffer instead of a
    Python loop over n limbs per element (~100x faster at million-element
    scale — witness vectors, QAP scalars)."""
    xs = np.asarray(xs, dtype=object)
    flat = xs.reshape(-1)
    nbytes = 2 * n
    buf = b"".join(int(v).to_bytes(nbytes, "little") for v in flat)
    out = (
        np.frombuffer(buf, dtype="<u2")
        .reshape(flat.shape[0], n)
        .astype(np.uint32)
    )
    return out.reshape(xs.shape + (n,))


def array_to_ints(a) -> np.ndarray:
    """(..., n) limb array -> object array of Python ints (scalar if 1-D)."""
    a = np.asarray(a)
    shape = a.shape[:-1]
    flat = a.reshape(-1, a.shape[-1]).astype(np.uint16).astype("<u2")
    nbytes = 2 * flat.shape[1]
    buf = flat.tobytes()
    out = np.empty((flat.shape[0],), dtype=object)
    for i in range(flat.shape[0]):
        out[i] = int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little")
    return out.reshape(shape) if shape else out[0]


class LimbField:
    """Montgomery arithmetic mod `modulus` on (..., n) uint16-in-uint32 limbs.

    `backend` is "jax" (default; jnp ops, jit/TPU-ready) or "np" (plain
    numpy, eager, used for host logic and fast tests).
    """

    def __init__(self, modulus: int, n_limbs: int, name: str = "F", backend: str = "jax"):
        assert 2 * modulus < (1 << (W * n_limbs)), "need headroom for lazy sums"
        self.p = modulus
        self.n = n_limbs
        self.name = name
        self.backend = backend
        if backend == "jax":
            import jax.numpy as jnp

            self.xp = jnp
        else:
            self.xp = np
        self.R = 1 << (W * n_limbs)
        self.R_mod_p = self.R % modulus
        self.R2 = (self.R * self.R) % modulus
        # -p^{-1} mod R
        self.p_inv_neg = (-pow(modulus, -1, self.R)) % self.R

        self.p_limbs = self.xp.asarray(int_to_limbs(modulus, n_limbs))
        self.p_inv_neg_limbs = self.xp.asarray(int_to_limbs(self.p_inv_neg, n_limbs))
        self.one_mont_limbs = self.xp.asarray(int_to_limbs(self.R_mod_p, n_limbs))

    # ---------------- backend shims ----------------

    def _slice_add(self, arr, idx, val):
        if self.xp is np:
            arr[idx] += val
            return arr
        return arr.at[idx].add(val)

    def _slice_set(self, arr, idx, val):
        if self.xp is np:
            arr = arr.copy()
            arr[idx] = val
            return arr
        return arr.at[idx].set(val)

    def _fori(self, lo: int, hi: int, body, init):
        if self.xp is np:
            acc = init
            for i in range(lo, hi):
                acc = body(i, acc)
            return acc
        import jax

        return jax.lax.fori_loop(lo, hi, body, init)

    # ---------------- host <-> array conversion ----------------

    def encode(self, xs, mont: bool = True):
        """Python ints -> limb array (optionally in Montgomery form).
        Pure host-side work (no device compute)."""
        scalar = np.isscalar(xs) or isinstance(xs, int)
        arr = np.asarray([xs] if scalar else xs, dtype=object)
        if mont:
            vals = [(int(v) % self.p) * self.R_mod_p % self.p for v in arr.reshape(-1)]
        else:
            vals = [int(v) % self.p for v in arr.reshape(-1)]
        out = ints_to_array(vals, self.n).reshape(arr.shape + (self.n,))
        if scalar:
            out = out[0]
        return self.xp.asarray(out)

    def decode(self, a, mont: bool = True):
        """Limb array -> Python ints (object ndarray, or int if 1-D input).
        Pure host-side work."""
        a = np.asarray(a)
        ints = array_to_ints(a)
        if mont:
            r_inv = pow(self.R_mod_p, -1, self.p)
            if np.ndim(ints) == 0 or isinstance(ints, int):
                return int(ints) * r_inv % self.p
            conv = np.empty(ints.shape, dtype=object)
            for idx, v in np.ndenumerate(ints):
                conv[idx] = int(v) * r_inv % self.p
            return conv
        return ints

    # ---------------- carry machinery ----------------

    def _shift_up(self, a, d: int):
        """Limb k takes limb k-d (zeros shifted in at the bottom)."""
        xp = self.xp
        pad = [(0, 0)] * (a.ndim - 1) + [(d, 0)]
        return xp.pad(a[..., :-d], pad)

    def _carry(self, acc):
        """Propagate 16-bit carries across the last axis (input limbs may be
        any uint32 with column sums < 2^22).  Exact, fully vectorized:
        two folding passes reduce limbs to <= 2^16, then a Kogge-Stone
        generate/propagate prefix resolves the +1 ripple in log2(n) steps
        (the naive sequential scan made every op ~200 HLOs and blew up
        XLA compile times).  Returns (normalized limbs, carry_out)."""
        xp = self.xp
        s = (acc & MASK) + self._shift_up(acc >> W, 1)  # limbs < 2^16 + 2^6
        t = (s & MASK) + self._shift_up(s >> W, 1)  # limbs <= 2^16
        top_g = t[..., -1] >> W
        gen = self._shift_up(t >> W, 1).astype(np.bool_)  # carry INTO limb k
        prop = self._shift_up(t == MASK, 1)
        d = 1
        while d < t.shape[-1]:
            gen = gen | (prop & self._shift_up(gen, d))
            prop = prop & self._shift_up(prop, d)
            d *= 2
        out = (t + gen.astype(np.uint32)) & MASK
        top_p = (t[..., -1] == MASK) & gen[..., -1]
        return out, (top_g | top_p.astype(np.uint32)).astype(np.uint32)

    def _sub_raw(self, a, b):
        """a - b with Kogge-Stone borrow resolution;
        returns (diff limbs, borrow_out in {0,1})."""
        xp = self.xp
        a, b = xp.broadcast_arrays(a, b)
        big = np.uint32(1 << W)
        d0 = a + big - b  # in [1, 2^17 - 1]
        top_g = (d0[..., -1] >> W) == 0
        gen = self._shift_up((d0 >> W) == 0, 1)  # borrow INTO limb k
        prop = self._shift_up(d0 == big, 1)
        d = 1
        while d < self.n:
            gen = gen | (prop & self._shift_up(gen, d))
            prop = prop & self._shift_up(prop, d)
            d *= 2
        out = (d0 - gen.astype(np.uint32)) & MASK
        top_p = (d0[..., -1] == big) & gen[..., -1]
        return out, (top_g | top_p).astype(np.uint32)

    # ---------------- ring ops ----------------

    def add(self, a, b):
        s, _ = self._carry(a + b)
        return self._cond_sub_p(s)

    def sub(self, a, b):
        d, borrow = self._sub_raw(a, b)
        dp, _ = self._carry(d + self.p_limbs)
        return self.xp.where((borrow != 0)[..., None], dp, d)

    def neg(self, a):
        d, _ = self._sub_raw(self.xp.broadcast_to(self.p_limbs, a.shape), a)
        return self.xp.where(self.is_zero(a)[..., None], a, d)

    def double(self, a):
        return self.add(a, a)

    def _cond_sub_p(self, a):
        d, borrow = self._sub_raw(a, self.p_limbs)
        return self.xp.where((borrow != 0)[..., None], a, d)

    # Multiply formulation:
    #   "rows"  — schoolbook as statically-shifted partial-product rows
    #             (dense elementwise HLO; XLA:TPU fuses it well, but
    #             XLA:CPU's LLVM codegen takes ~2 min for ONE curve add
    #             built from it — measured round 4)
    #   "dot"   — 8-bit sublimb outer product contracted against a
    #             precomputed one-hot column tensor with a single int32
    #             matmul (a library call on CPU: compiles in seconds,
    #             bit-identical results)
    #   "auto"  — "dot" off-TPU, "rows" on TPU
    mul_impl: str = "auto"

    def _mul_dot(self) -> bool:
        if self.backend != "jax" or self.mul_impl == "rows":
            return False
        if self.mul_impl == "dot":
            return True
        import jax

        return jax.default_backend() != "tpu"

    @functools.cached_property
    def _col_onehot(self):
        """(2n*2n, 4n) int32 one-hot: E[i*2n+j, k] = 1 iff i+j == k.
        Contracting the 8-bit sublimb outer product against it sums the
        product columns in ONE dot op.  Kept as a HOST numpy constant:
        converting inside a trace would cache a tracer (leak)."""
        m = 2 * self.n
        E = np.zeros((m * m, 2 * m), np.int32)
        for i in range(m):
            for j in range(m):
                E[i * m + j, i + j] = 1
        return E

    def _mul_cols_dot(self, a, b, n_cols: int):
        """First n_cols 16-bit columns of a*b via the one-hot dot.
        Sublimbs are 8-bit, so every outer product fits int32 and each
        8-bit column sum is < 2n*255^2 < 2^22; recombining neighbor
        columns (lo + (hi<<8)) stays < 2^31.  Output feeds _carry."""
        xp = self.xp
        n = self.n
        a, b = xp.broadcast_arrays(a, b)
        a8 = xp.stack([a & 0xFF, a >> 8], axis=-1).reshape(a.shape[:-1] + (2 * n,))
        b8 = xp.stack([b & 0xFF, b >> 8], axis=-1).reshape(b.shape[:-1] + (2 * n,))
        prod = (a8[..., :, None] * b8[..., None, :]).astype(np.int32)
        flat = prod.reshape(prod.shape[:-2] + (4 * n * n,))
        cols8 = flat @ self._col_onehot  # (..., 4n) 8-bit-scale columns
        cols = (cols8[..., 0 : 2 * n_cols : 2]
                + (cols8[..., 1 : 2 * n_cols : 2] << 8)).astype(np.uint32)
        limbs, _ = self._carry(cols)
        return limbs

    def mul_wide(self, a, b):
        """Full 2n-limb product of two n-limb values (normalized).

        Schoolbook as a stack of statically-shifted partial-product rows
        reduced in ONE sum — no dynamic-update-slice chains (those made
        XLA compile time explode: a single curve add took 100 s to
        compile with the naive accumulate-in-place formulation).
        Column sums stay < n·2^17 < 2^22, so one carry sweep suffices."""
        xp = self.xp
        n = self.n
        if self._mul_dot():
            return self._mul_cols_dot(a, b, 2 * n)
        a, b = xp.broadcast_arrays(a, b)
        prod = a[..., :, None] * b[..., None, :]  # (..., i, j) 32-bit products
        lo = prod & MASK
        hi = prod >> W
        pad = [(0, 0)] * (lo.ndim - 2)
        rows = [
            xp.pad(lo[..., i, :], pad + [(i, n - i)])
            + xp.pad(hi[..., i, :], pad + [(i + 1, n - i - 1)])
            for i in range(n)
        ]
        acc = xp.sum(xp.stack(rows, axis=-2), axis=-2)
        limbs, _ = self._carry(acc)
        return limbs

    def _mul_low(self, a, b):
        """Low n limbs of a*b (mod R) — same shifted-row formulation,
        truncated to n columns."""
        xp = self.xp
        n = self.n
        if self._mul_dot():
            return self._mul_cols_dot(a, b, n)
        a, b = xp.broadcast_arrays(a, b)
        prod = a[..., :, None] * b[..., None, :]
        lo = prod & MASK
        hi = prod >> W
        pad = [(0, 0)] * (lo.ndim - 2)
        rows = [
            xp.pad(lo[..., i, : n - i], pad + [(i, 0)])
            + xp.pad(hi[..., i, : n - i - 1], pad + [(i + 1, 0)])
            for i in range(n)
        ]
        acc = xp.sum(xp.stack(rows, axis=-2), axis=-2)
        limbs, _ = self._carry(acc)
        return limbs

    def redc(self, t):
        """Montgomery reduction: t (2n limbs, t < p*R) -> t*R^{-1} mod p."""
        n = self.n
        m = self._mul_low(t[..., :n], self.p_inv_neg_limbs)
        mp = self.mul_wide(m, self.p_limbs)
        s, _ = self._carry(t + mp)  # low n limbs become zero; no carry-out
        return self._cond_sub_p(s[..., n:])

    # Pallas fast path: on TPU, large-batch Montgomery muls run as a
    # fused VMEM kernel (~40x the jnp path, which is HBM-bound on its
    # (B, n, 2n) intermediates).  "auto" enables it when the default
    # backend is TPU; tests on CPU keep the jnp path (the kernel's
    # bit-exactness is asserted separately via interpret mode).
    use_pallas: str = "auto"  # "auto" | "always" | "never"
    _PALLAS_MIN_BATCH = 2048

    def _pallas_ok(self, shape) -> bool:
        if self.backend != "jax" or self.use_pallas == "never":
            return False
        batch = 1
        for d in shape[:-1]:
            batch *= d
        if batch < self._PALLAS_MIN_BATCH:
            return False
        if self.use_pallas == "always":
            return True
        import jax

        return jax.default_backend() == "tpu"

    def mont_mul(self, a, b):
        shape = np.broadcast_shapes(tuple(a.shape), tuple(b.shape))
        if self._pallas_ok(shape):
            from ..ops.pallas_field import pallas_mont_mul

            return pallas_mont_mul(self, a, b)
        return self.redc(self.mul_wide(a, b))

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def to_mont(self, a):
        r2 = self.xp.asarray(int_to_limbs(self.R2, self.n))
        return self.mont_mul(a, r2)

    def from_mont(self, a):
        if self._pallas_ok(tuple(a.shape)):
            # REDC(a*1) == a*R^{-1}: rides the VMEM-tiled Pallas kernel,
            # whose live set is O(tile) — the raw redc path materializes
            # (B, n, 2n) u32 temps (7.5 GB at mainnet keygen sizes)
            one = self.xp.asarray(int_to_limbs(1, self.n))
            return self.mont_mul(a, one[None])
        pad = self.xp.zeros(a.shape[:-1] + (self.n,), np.uint32)
        return self.redc(self.xp.concatenate([a, pad], axis=-1))

    # ---------------- predicates ----------------

    def is_zero(self, a):
        return self.xp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return self.xp.all(a == b, axis=-1)

    def select(self, cond, a, b):
        """cond ? a : b  (cond has the batch shape, no limb axis)."""
        return self.xp.where(cond[..., None], a, b)

    # ---------------- exponentiation / inversion ----------------

    def pow_mont(self, a, e: int):
        """a^e for a fixed Python-int exponent.  4-bit windows driven by a
        fori_loop so the compiled graph stays one-window-sized; multiplying
        by the table's 1-entry is the Montgomery identity, so the loop body
        is branch-free."""
        xp = self.xp
        if e == 0:
            return xp.broadcast_to(self.one_mont_limbs, a.shape)
        tbl = [xp.broadcast_to(self.one_mont_limbs, a.shape), a]
        for _ in range(14):
            tbl.append(self.mont_mul(tbl[-1], a))
        tbl = xp.stack(tbl, axis=0)  # (16, ..., n)
        digits = []
        x = e
        while x > 0:
            digits.append(x & 0xF)
            x >>= 4
        digits.reverse()
        digits_arr = xp.asarray(np.array(digits, dtype=np.int32))
        acc = tbl[digits[0]]

        def body(i, acc):
            acc = self.mont_sqr(self.mont_sqr(self.mont_sqr(self.mont_sqr(acc))))
            return self.mont_mul(acc, tbl[digits_arr[i]])

        if len(digits) > 1:
            acc = self._fori(1, len(digits), body, acc)
        return acc

    def inv_mont(self, a):
        """Batched inversion via Fermat (a^(p-2)); inverse of 0 is 0."""
        return self.pow_mont(a, self.p - 2)

    # ---------------- constants ----------------

    def zeros(self, shape=()):
        return self.xp.zeros(tuple(shape) + (self.n,), np.uint32)

    def ones_mont(self, shape=()):
        return self.xp.broadcast_to(self.one_mont_limbs, tuple(shape) + (self.n,))

    def const_mont(self, x: int):
        """Single constant in Montgomery form, shape (n,), computed host-side."""
        return self.xp.asarray(
            int_to_limbs((int(x) % self.p) * self.R_mod_p % self.p, self.n)
        )


# The two fields of BLS12-381.
from .host import FP_MODULUS, FR_MODULUS  # noqa: E402

FR_LIMBS = 16  # 256 bits
FP_LIMBS = 24  # 384 bits


@functools.cache
def fr_field(backend: str = "jax") -> LimbField:
    return LimbField(FR_MODULUS, FR_LIMBS, "Fr", backend)


@functools.cache
def fp_field(backend: str = "jax") -> LimbField:
    return LimbField(FP_MODULUS, FP_LIMBS, "Fp", backend)

"""Device-side sparse R1CS evaluation — witness matvec + QAP-at-tau.

The two prover/keygen hot paths over a `CompiledR1CS` (COO terms with a
coefficient palette, groth16.r1cs):

  * row evaluation   a_j = Σ_i A[j,i]·z_i      (per proof, prove.py)
  * column evaluation u_i(τ) = Σ_j A[j,i]·L_j(τ) (once, keygen.py)

Both are the same kernel: gather two Montgomery operands, one batched
Montgomery multiply (Pallas on TPU), then a segmented modular sum.
The reference gets these from bellman's per-core constraint walk; here
they are three device dispatches regardless of circuit size
(SURVEY.md §7 stage 7 "vectorized trace evaluation, sparse matvec").

Segmented modular sums use a two-level trick to stay in uint32: limbs
after mont_mul are 16-bit, so a segment_sum of up to 2^16 terms cannot
overflow.  Level 1 sums term chunks of ≤2^15 per segment; the redundant
(≤32-bit-limb) partials are folded back below the modulus with two
Montgomery multiplies (lo + 2^16·hi), and level 2 sums the ≤2^16
reduced partials per segment the same way.  Handles 2^31 terms per
segment — far beyond any circuit's densest column (the ONE column).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

from ..fields.host import FR_MODULUS
from ..fields.limbs import fr_field
from .r1cs import CompiledR1CS

P = FR_MODULUS
_CAP = 1 << 15  # level-1 chunk bound (sum of 2^15 16-bit limbs < 2^31)


def _two_level_plan(seg_ids: np.ndarray, n_seg: int):
    """seg_ids: sorted int array (T,).  Returns (l1_ids, n1, l1_seg):
    l1_ids[t] = dense id of (segment, chunk-within-segment) for term t;
    l1_seg[g] = segment of level-1 group g."""
    T = seg_ids.shape[0]
    if T == 0:
        return (
            np.zeros(0, np.int32),
            0,
            np.zeros(0, np.int32),
        )
    counts = np.bincount(seg_ids, minlength=n_seg)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(T, dtype=np.int64) - offsets[seg_ids]
    sub = pos // _CAP
    # dense-rank composite (seg, sub) — seg_ids sorted => composite sorted
    comp = seg_ids.astype(np.int64) * ((counts.max() // _CAP) + 1) + sub
    change = np.concatenate([[True], comp[1:] != comp[:-1]])
    l1_ids = np.cumsum(change) - 1
    n1 = int(l1_ids[-1]) + 1
    l1_seg = np.zeros(n1, dtype=np.int64)
    l1_seg[l1_ids] = seg_ids
    assert counts.max() // _CAP < (1 << 16), "segment too dense for 2 levels"
    return l1_ids.astype(np.int32), n1, l1_seg.astype(np.int32)


@functools.cache
def _reduce_consts(backend: str):
    F = fr_field(backend)
    # stacked [R mod p, 2^16·R mod p] for the lo/hi fold
    lo_c = F.R_mod_p % F.p
    hi_c = (1 << 16) * F.R_mod_p % F.p
    return F.xp.asarray(F.encode(np.array([lo_c, hi_c], dtype=object), mont=False))


def redundant_reduce(F, s32):
    """(B, n) uint32 limbs, each < 2^32, value < 2^16·p  ->  canonical
    (B, n) Montgomery element of the same residue.  Two mont_muls:
    lo·(R mod p) ≡ lo, hi·(2^16 R mod p) ≡ 2^16·hi  (mod p)."""
    consts = _reduce_consts(F.backend)
    lo = s32 & np.uint32(0xFFFF)
    hi = s32 >> np.uint32(16)
    stacked = F.xp.stack([lo, hi], axis=0)
    folded = F.mont_mul(stacked, consts[:, None, :])
    return F.add(folded[0], folded[1])


def _segsum_mod(F, products, l1_ids, n1, l1_seg, n_seg):
    """products: (T, n) mont limbs -> (n_seg, n) mont limbs (modular sum)."""
    import jax

    s1 = jax.ops.segment_sum(products, l1_ids, num_segments=n1)
    r1 = redundant_reduce(F, s1)
    s2 = jax.ops.segment_sum(r1, l1_seg, num_segments=n_seg)
    return redundant_reduce(F, s2)


@functools.cache
def _eval_fn(backend: str, T: int, n1: int, n_seg: int):
    """jitted: (operand gather ids, palette ids, tables) -> segment sums."""
    F = fr_field(backend)
    _reduce_consts(backend)  # cached constants must materialize untraced

    def run(tbl_mont, pal_mont, op_idx, cid_idx, l1_ids, l1_seg):
        products = F.mont_mul(tbl_mont[op_idx], pal_mont[cid_idx])
        return _segsum_mod(F, products, l1_ids, n1, l1_seg, n_seg)

    if backend == "jax":
        import jax

        run = jax.jit(run)
    return run


_TCHUNK = 1 << 21  # terms per streamed eval pass (~0.5 GB live HBM)


@functools.cache
def _eval_chunk_fn(backend: str, n1: int):
    """jitted accumulate step of the streamed eval: one term chunk's
    products are level-1 segment-summed into the running (n1, 16) raw
    uint32 partials (level-1 groups hold <= 2^15 16-bit limbs GLOBALLY,
    so cross-chunk accumulation cannot overflow).  Pad terms carry
    l1_id == n1 and fall into a dummy row that is dropped."""
    F = fr_field(backend)

    def run(tbl_mont, pal_mont, op_idx, cid_idx, l1_ids, s1):
        import jax

        products = F.mont_mul(tbl_mont[op_idx], pal_mont[cid_idx])
        part = jax.ops.segment_sum(products, l1_ids, num_segments=n1 + 1)
        return s1 + part[:n1]

    if backend == "jax":
        import jax

        run = jax.jit(run, donate_argnums=(5,))
    return run


@functools.cache
def _finish_fn(backend: str, n1: int, n_seg: int):
    F = fr_field(backend)
    _reduce_consts(backend)

    def run(s1, l1_seg):
        import jax

        r1 = redundant_reduce(F, s1)
        s2 = jax.ops.segment_sum(r1, l1_seg, num_segments=n_seg)
        return redundant_reduce(F, s2)

    if backend == "jax":
        import jax

        run = jax.jit(run)
    return run


class _MatPlan:
    """Plan for one sparse matrix × one segmentation.  Index arrays stay
    HOST-side; the one-shot path uploads them whole (small circuits),
    the streamed path (T > _TCHUNK — mainnet batch sizes, where a
    single (T, 16) product tensor would exhaust HBM) uploads and
    reduces one _TCHUNK slice at a time."""

    def __init__(self, op_idx, cids, seg_ids, n_seg, backend):
        order = np.argsort(seg_ids, kind="stable")
        seg_sorted = seg_ids[order]
        l1_ids, n1, l1_seg = _two_level_plan(seg_sorted, n_seg)
        self.T = op_idx.shape[0]
        self.n1 = n1
        self.n_seg = n_seg
        self.op_idx = op_idx[order].astype(np.int32)
        self.cid_idx = cids[order].astype(np.int32)
        self.l1_ids = l1_ids
        self.l1_seg = l1_seg
        self.backend = backend
        self._dev = None

    def eval(self, tbl_mont, pal_mont):
        F = fr_field(self.backend)
        xp = F.xp
        if self.T == 0:
            return F.zeros((self.n_seg,))
        if self.T <= _TCHUNK:
            if self._dev is None:
                self._dev = tuple(
                    xp.asarray(a) for a in
                    (self.op_idx, self.cid_idx, self.l1_ids, self.l1_seg)
                )
            fn = _eval_fn(self.backend, self.T, self.n1, self.n_seg)
            return fn(tbl_mont, pal_mont, *self._dev)
        step = _eval_chunk_fn(self.backend, self.n1)
        s1 = xp.zeros((self.n1, 16), xp.uint32 if hasattr(xp, "uint32")
                      else np.uint32)
        for lo in range(0, self.T, _TCHUNK):
            hi = min(lo + _TCHUNK, self.T)
            op = self.op_idx[lo:hi]
            cid = self.cid_idx[lo:hi]
            l1 = self.l1_ids[lo:hi]
            if hi - lo < _TCHUNK:
                pad = _TCHUNK - (hi - lo)
                op = np.concatenate([op, np.zeros(pad, np.int32)])
                cid = np.concatenate([cid, np.zeros(pad, np.int32)])
                l1 = np.concatenate(
                    [l1, np.full(pad, self.n1, np.int32)]
                )
            s1 = step(tbl_mont, pal_mont, xp.asarray(op), xp.asarray(cid),
                      xp.asarray(l1), s1)
        fin = _finish_fn(self.backend, self.n1, self.n_seg)
        return fin(s1, xp.asarray(self.l1_seg))


class DeviceR1CS:
    """Compiled circuit matrices uploaded once, evaluated per proof.

    The A matrix is extended with the per-input rows (input_i)·0 = 0
    that make input polynomials linearly independent (bellman's domain
    layout; groth16.qap.extend_matrices)."""

    def __init__(self, compiled: CompiledR1CS, backend: str = "jax"):
        self.c = compiled
        self.backend = backend
        F = fr_field(backend)
        n, ni = compiled.n_constraints, compiled.num_inputs
        self.n_rows = n + ni  # extended
        pal = np.array(compiled.palette, dtype=object)
        self.pal_mont = F.xp.asarray(F.encode(pal, mont=True))

        one_cid = compiled.palette.index(1)
        ext_rows = np.arange(n, n + ni, dtype=np.int32)
        ext_vars = np.arange(ni, dtype=np.int32)
        ext_cids = np.full(ni, one_cid, dtype=np.int32)
        self._mats = []
        for m in range(3):
            rows, vars_, cids = (
                compiled.rows[m], compiled.vars[m], compiled.cids[m],
            )
            if m == 0:
                rows = np.concatenate([rows, ext_rows])
                vars_ = np.concatenate([vars_, ext_vars])
                cids = np.concatenate([cids, ext_cids])
            self._mats.append((rows, vars_, cids))
        # plans are built lazily: the prover only ever needs row plans,
        # keygen only column plans — at mainnet batch sizes each set's
        # index arrays are hundreds of MB
        self._row_plans: List[_MatPlan] = []
        self._col_plans: List[_MatPlan] = []

    @property
    def row_plans(self):
        if not self._row_plans:
            self._row_plans = [
                _MatPlan(v, c, r, self.n_rows, self.backend)
                for r, v, c in self._mats
            ]
        return self._row_plans

    @property
    def col_plans(self):
        if not self._col_plans:
            self._col_plans = [
                _MatPlan(r, c, v, self.c.num_vars, self.backend)
                for r, v, c in self._mats
            ]
        return self._col_plans

    def eval_rows(self, z_mont):
        """z_mont: (num_vars, n) mont limbs -> 3×(n_rows, n) mont evals."""
        return tuple(p.eval(z_mont, self.pal_mont) for p in self.row_plans)

    def eval_cols(self, L_mont):
        """L_mont: (n_rows, n) mont Lagrange values at τ -> u, v, w per var."""
        return tuple(p.eval(L_mont, self.pal_mont) for p in self.col_plans)


def encode_mont(vals, backend: str = "jax"):
    """Host ints -> device Montgomery limbs, via the fast byte path and a
    single device to_mont multiply (avoids a million host big-int muls)."""
    F = fr_field(backend)
    std = F.xp.asarray(F.encode(np.array(vals, dtype=object), mont=False))
    return F.to_mont(std)

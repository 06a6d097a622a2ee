"""Batched Poseidon permutation on TPU.

Hash-parallel, not round-parallel: a batch of B independent Poseidon-t hashes
is laid out as a (B, t, 16) uint32 limb tensor (Montgomery form) and the
round schedule is a fori_loop of vectorized field ops, so the batch axis
rides the VPU lanes.  This is the kernel behind bulk Merkle-tree builds and
witness generation (reference hot loop: src/zk/state/mod.rs:343-416 rehashes
one Poseidon per tree level per touched leaf; here whole levels hash at once).

Bit-exact vs the host Poseidon (and the reference's 16 golden vectors,
src/zk/poseidon/mod.rs:115-149).  Backend-generic like the limb engine: the
numpy twin runs the identical algorithm eagerly for tests/host logic.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.limbs import LimbField, fr_field
from ..zk.poseidon_host import params_for_width


@functools.cache
def _mont_params(t: int):
    """Round constants (n_rounds, t, 16) and MDS (t, t, 16), Montgomery, numpy."""
    F = fr_field("np")
    p = params_for_width(t)
    rc = np.asarray(F.encode(np.array(p.round_constants, dtype=object)))
    rc = rc.reshape(p.full_rounds + p.partial_rounds, t, F.n)
    mds = np.asarray(F.encode(np.array([x for row in p.mds for x in row], dtype=object)))
    mds = mds.reshape(t, t, F.n)
    return p, rc, mds


def _permute(F: LimbField, state, rc, mds, full_rounds: int, partial_rounds: int):
    """state: (B, t, n) Montgomery limbs -> permuted state."""
    t = state.shape[-2]

    def sbox(x):
        x2 = F.mont_sqr(x)
        x4 = F.mont_sqr(x2)
        return F.mont_mul(x4, x)

    def mds_mul(s):
        # out[b, j] = sum_k mds[j, k] * s[b, k] — one broadcast mont_mul over
        # the whole (B, t, t) lattice, then a t-step tree of field adds.
        prod = F.mont_mul(mds[None, :, :, :], s[:, None, :, :])  # (B, t, t, n)
        acc = prod[:, :, 0, :]
        for k in range(1, t):
            acc = F.add(acc, prod[:, :, k, :])
        return acc

    def make_body(is_full):
        def body(r, s):
            s = F.add(s, rc[r][None])
            if is_full:
                s = sbox(s)
            else:
                s = F._slice_set(s, (slice(None), 0, slice(None)), sbox(s[:, 0, :]))
            return mds_mul(s)

        return body

    half = full_rounds // 2
    state = F._fori(0, half, make_body(True), state)
    state = F._fori(half, half + partial_rounds, make_body(False), state)
    state = F._fori(
        half + partial_rounds, full_rounds + partial_rounds, make_body(True), state
    )
    return state


@functools.cache
def _hash_fn(t: int, backend: str):
    p, rc_np, mds_np = _mont_params(t)
    F = fr_field(backend)
    rc = F.xp.asarray(rc_np)
    mds = F.xp.asarray(mds_np)

    def run(inputs):
        """inputs: (B, t-1, n) Montgomery limbs -> (B, n) hash."""
        B = inputs.shape[0]
        cap = F.xp.zeros((B, 1, F.n), np.uint32)
        state = F.xp.concatenate([cap, inputs], axis=1)
        out = _permute(F, state, rc, mds, p.full_rounds, p.partial_rounds)
        return out[:, 1, :]

    if backend == "jax":
        import jax

        run = jax.jit(run)
    return run


def poseidon_batch_mont(inputs, backend: str = "jax"):
    """Hash a batch: (B, arity, 16) Montgomery limbs -> (B, 16)."""
    arity = inputs.shape[1]
    return _hash_fn(arity + 1, backend)(inputs)


def poseidon_batch(values, backend: str = "jax") -> np.ndarray:
    """Convenience host API: (B, arity) Python-int array -> (B,) ints."""
    F = fr_field(backend)
    values = np.asarray(values, dtype=object)
    enc = F.xp.asarray(F.encode(values))
    out = poseidon_batch_mont(enc, backend)
    return F.decode(np.asarray(out))

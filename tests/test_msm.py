"""Pippenger MSM vs naive host sums: G1 and G2, skewed and random scalars.

All G1 cases share one kernel shape (n=16, c=4) so the whole file costs
three XLA compiles (G1 c=4, G1 c=8, G2 c=4) — each persistent-cached.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile/execution-heavy device kernels

from bazuka_tpu.crypto import bls12_381 as bls
from bazuka_tpu.ops.msm import msm_g1_host, msm_g2_host

N = 16


def naive_g1(points, scalars):
    acc = None
    for p, s in zip(points, scalars):
        acc = bls.g1_add(acc, bls.g1_mul(p, s))
    return acc


def naive_g2(points, scalars):
    acc = None
    for p, s in zip(points, scalars):
        acc = bls.g2_add(acc, bls.g2_mul(p, s))
    return acc


def pad16(pts, scalars):
    """Pad to the shared kernel size with zero-scalar identity terms."""
    return (
        pts + [None] * (N - len(pts)),
        scalars + [0] * (N - len(scalars)),
    )


# (points, scalars, nbits) — 64-bit cases run 4x fewer windows
CASES = {
    "small": pad16([bls.g1_mul(bls.G1_GEN, k) for k in range(1, 5)], [0, 1, 2, 3]) + (64,),
    "skewed": (
        [bls.g1_mul(bls.G1_GEN, k) for k in range(1, 17)],
        [0] * 8 + [1] * 4 + [bls.R - 1] * 3 + [12345],
        255,
    ),
    "zeros": ([bls.g1_mul(bls.G1_GEN, k) for k in range(1, 17)], [0] * 16) + (64,),
    "infinity": pad16([bls.G1_GEN, None, bls.g1_double(bls.G1_GEN), None], [3, 5, 7, 0]) + (64,),
}


def _random_case(seed):
    rng = np.random.default_rng(seed)
    pts = [bls.g1_mul(bls.G1_GEN, int(k)) for k in rng.integers(1, 2**30, size=N)]
    scalars = [
        (int(a) << 192 | int(b) << 128 | int(c) << 64 | int(d)) % bls.R
        for a, b, c, d in rng.integers(0, 2**63, size=(N, 4))
    ]
    return pts, scalars, 255


CASES["random"] = _random_case(0)


@pytest.mark.parametrize("name", sorted(CASES))
def test_msm_g1(name):
    pts, scalars, nbits = CASES[name]
    want = naive_g1(pts, scalars)
    assert msm_g1_host(pts, scalars, c=4, nbits=nbits) == want


def test_msm_g1_window8():
    pts, scalars, _ = CASES["small"]
    assert msm_g1_host(pts, scalars, c=8, nbits=64) == naive_g1(pts, scalars)


def test_msm_g2():
    rng = np.random.default_rng(2)
    n = 8
    pts = [bls.g2_mul(bls.G2_GEN, int(k)) for k in rng.integers(1, 2**20, size=n)]
    scalars = [int(s) for s in rng.integers(0, 2**63, size=n)]
    assert msm_g2_host(pts, scalars, c=4, nbits=64) == naive_g2(pts, scalars)


# ---------------------------------------------------- v3 balanced drain
#
# The round-3 drain (pallas_msm._msm_program_v3): sorted-stream blocks,
# static round count, run trace + segmented merge.  Forced at tiny sizes
# by passing chunk == N (the auto rule engages it when N >= chunk).


def _v3_msm(pts, scalars, c, nbits, chunk):
    from bazuka_tpu.ops.msm import _enc_scalars
    from bazuka_tpu.ops import pallas_msm as pm

    P_am, inf = pm.points_to_am(pts)
    s = _enc_scalars(scalars, "jax")
    return pm.msm_lm(P_am, inf, s, c=c, nbits=nbits, chunk=chunk)


def test_msm_g1_v3():
    """One shared shape (n=16, c=4, 64-bit): duplicate runs, zero
    digits, and infinity rows exercise the run-boundary/validity logic.
    (XLA:CPU executes each compiled v3 shape in ~tens of seconds, so
    the cases share one compile; chip-scale checks live in
    tools/profile_msm*.py.)"""
    pts = [bls.g1_mul(bls.G1_GEN, k) for k in range(1, 17)]
    pts[3] = None
    scalars = [7, 7, 7, 5, 0, 0, 1, 2**63 - 1] + list(range(11, 19))
    want = naive_g1(pts, scalars)
    assert _v3_msm(pts, scalars, c=4, nbits=64, chunk=16) == want


def test_msm_g1_v3_multichunk():
    """Bucket runs split across chunk boundaries must merge exactly
    (same compiled shape for both chunks)."""
    pts = [bls.g1_mul(bls.G1_GEN, k) for k in range(1, 17)]
    scalars = [3] * 10 + list(range(100, 106))  # one run spans chunks
    want = naive_g1(pts, scalars)
    assert _v3_msm(pts, scalars, c=4, nbits=64, chunk=8) == want


def test_msm_g2_v3():
    rng = np.random.default_rng(3)
    n = 8
    pts = [bls.g2_mul(bls.G2_GEN, int(k)) for k in rng.integers(1, 2**20, size=n)]
    scalars = [int(s) for s in rng.integers(0, 2**63, size=n)]
    from bazuka_tpu.ops import pallas_msm as pm
    from bazuka_tpu.ops.msm import _enc_scalars

    P_am, inf = pm.points_to_am_g2(pts)
    s = _enc_scalars(scalars, "jax")
    got = pm.msm_lm_g2(P_am, inf, s, c=4, nbits=64, chunk=n)
    assert got == naive_g2(pts, scalars)

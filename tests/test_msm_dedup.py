"""Duplicate-scalar MSM pre-reduction (ops.pallas_msm presum).

Witness vectors assign the same tiny values (booleans, selector
constants) to hundreds of thousands of wires; without pre-reduction the
bucket-serial drain's round count equals the max duplicate group size
(reference analog: bellman's multiexp walks buckets per core, so its
cost never depends on the scalar distribution)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile/execution-heavy device kernels

from bazuka_tpu.crypto import bls12_381 as bls
from bazuka_tpu.ops import pallas_msm as pm
from bazuka_tpu.ops.msm import _enc_scalars
from bazuka_tpu.ops import weierstrass as wst


def _oracle(pts, scalars):
    want = None
    for p, s in zip(pts, scalars):
        want = bls.g1_add(want, bls.g1_mul(p, s))
    return want


def _dup_instance(n, seed=0):
    """~60% of scalars drawn from 4 heavy values (incl. 0 and 1)."""
    rng = np.random.default_rng(seed)
    pts = [bls.g1_mul(bls.G1_GEN, k + 1) for k in range(n)]
    heavy_vals = [0, 1, 2, 77]
    scalars = []
    for i in range(n):
        if rng.random() < 0.6:
            scalars.append(heavy_vals[rng.integers(0, 4)])
        else:
            scalars.append(int(rng.integers(1, 2**62)) * 0x1000193 % bls.R)
    return pts, scalars


def test_dedup_plan_structure():
    _, scalars = _dup_instance(256)
    s_np = np.asarray(_enc_scalars(scalars, "jax"))
    plan = pm.make_dedup_plan(s_np, threshold=8)
    assert plan.active
    # zero never counts as a heavy group (it is dropped outright)
    heavy_ints = [
        sum(int(l) << (16 * i) for i, l in enumerate(row))
        for row in plan.heavy_scalars
    ]
    assert 0 not in heavy_ints
    assert 1 in heavy_ints
    # every heavy element position is covered by exactly the runs
    assert plan.run_len.sum() == plan.n_heavy_elems


def test_msm_dedup_matches_oracle():
    n = 256
    pts, scalars = _dup_instance(n)
    P_am, inf = pm.points_to_am(pts)
    s = _enc_scalars(scalars, "jax")
    plan = pm.make_dedup_plan(np.asarray(s), threshold=8)
    assert plan.active
    got = pm.msm_lm(P_am, inf, s, c=4, dedup_plan=plan)
    assert got == _oracle(pts, scalars)


def test_msm_dedup_all_same_scalar():
    """The pathological case: every scalar identical (one bucket holds
    every point) — plain draining would need n rounds."""
    n = 128
    pts = [bls.g1_mul(bls.G1_GEN, 3 * k + 2) for k in range(n)]
    scalars = [12345] * n
    P_am, inf = pm.points_to_am(pts)
    s = _enc_scalars(scalars, "jax")
    plan = pm.make_dedup_plan(np.asarray(s), threshold=8)
    got = pm.msm_lm(P_am, inf, s, c=4, dedup_plan=plan)
    assert got == _oracle(pts, scalars)


def test_g2_msm_v2_dedup_matches_oracle():
    """The v2 G2 MSM pipeline (point-major Fp2 affine, fused kernels)
    with duplicate-heavy scalars through the presum path."""
    n = 64
    rng = np.random.default_rng(1)
    pts = [bls.g2_mul(bls.G2_GEN, k + 1) for k in range(n)]
    scalars = [1 if rng.random() < 0.5 else int(rng.integers(1, 2**62))
               for i in range(n)]
    P_am, inf = pm.points_to_am_g2(pts)
    s = _enc_scalars(scalars, "jax")
    plan = pm.make_dedup_plan(np.asarray(s), threshold=4)
    assert plan.active
    got = pm.msm_lm_g2(P_am, inf, s, c=4, dedup_plan=plan)
    want = None
    for p, sc in zip(pts, scalars):
        want = bls.g2_add(want, bls.g2_mul(p, sc))
    assert got == want


def test_derived_aux_plan():
    """plan.derive_shifted(k) must reproduce the plan built directly on
    the shifted vector (same groups minus the input prefix)."""
    _, scalars = _dup_instance(128, seed=3)
    s_np = np.asarray(_enc_scalars(scalars, "jax"))
    plan = pm.make_dedup_plan(s_np, threshold=8)
    k = 5
    shifted = np.zeros_like(s_np)
    shifted[: len(scalars) - k] = s_np[k:]
    direct = pm.make_dedup_plan(shifted, threshold=8)
    derived = plan.derive_shifted(k)
    assert derived.active == direct.active
    if direct.active:
        # same element positions (derived may keep groups that fell
        # under the threshold after the shift — a superset is fine)
        assert set(direct.hpos) <= set(derived.hpos)
        assert derived.run_len.sum() == derived.n_heavy_elems

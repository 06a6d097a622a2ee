"""Batched G1/G2 Weierstrass kernels vs the host BLS12-381 oracle."""

import numpy as np
import pytest

from bazuka_tpu.crypto import bls12_381 as bls
from bazuka_tpu.ops import weierstrass as wst


@pytest.mark.parametrize("backend", ["np"])
def test_g1_complete_add(backend):
    K = wst.fp_ops(backend)
    b3 = wst.g1_b3(backend)
    g = bls.G1_GEN
    g2 = bls.g1_double(g)
    # pairs: generic add, doubling, P + (-P), P + 0, 0 + 0
    ps = [g, g, g, g, None]
    qs = [g2, g, bls.g1_neg(g), None, None]
    P = wst.g1_to_proj(K, ps)
    Q = wst.g1_to_proj(K, qs)
    R = wst.proj_add(K, P, Q, b3)
    got = wst.g1_from_proj(wst.fp_ops("np"), tuple(np.asarray(c) for c in R))
    want = [bls.g1_add(p, q) for p, q in zip(ps, qs)]
    assert got == want


@pytest.mark.parametrize("backend", ["np", "jax"])
def test_g1_scalar_mul(backend):
    from bazuka_tpu.fields.limbs import fr_field

    wst.warmup(backend)
    K = wst.fp_ops(backend)
    Fr = fr_field(backend)
    b3 = wst.g1_b3(backend)
    rng = np.random.default_rng(3)
    scalars = [0, 1, 2, bls.R - 1] + [int(x) for x in rng.integers(1, 2**62, size=3)]
    B = len(scalars)
    P = wst.g1_to_proj(K, [bls.G1_GEN] * B)
    s = Fr.xp.asarray(Fr.encode(np.array(scalars, dtype=object), mont=False))
    R = wst.proj_scalar_mul(K, P, s, b3)
    got = wst.g1_from_proj(wst.fp_ops("np"), tuple(np.asarray(c) for c in R))
    want = [bls.g1_mul(bls.G1_GEN, k) for k in scalars]
    assert got == want


@pytest.mark.parametrize("backend", ["np"])
def test_g2_add_and_mul(backend):
    from bazuka_tpu.fields.limbs import fr_field

    wst.warmup(backend)
    K = wst.fp2_ops(backend)
    Fr = fr_field(backend)
    b3 = wst.g2_b3(backend)
    g = bls.G2_GEN
    ps = [g, g, None]
    qs = [bls.g2_mul(g, 5), g, None]
    P = wst.g2_to_proj(K, ps)
    Q = wst.g2_to_proj(K, qs)
    got = wst.g2_from_proj(
        wst.fp2_ops("np"),
        tuple(tuple(np.asarray(x) for x in c) for c in wst.proj_add(K, P, Q, b3)),
    )
    want = [bls.g2_add(p, q) for p, q in zip(ps, qs)]
    assert got == want

    scalars = [7, 123456]
    s = Fr.xp.asarray(Fr.encode(np.array(scalars, dtype=object), mont=False))
    P2 = wst.g2_to_proj(K, [g, g])
    R = wst.proj_scalar_mul(K, P2, s, b3)
    got2 = wst.g2_from_proj(
        wst.fp2_ops("np"), tuple(tuple(np.asarray(x) for x in c) for c in R)
    )
    assert got2 == [bls.g2_mul(g, k) for k in scalars]

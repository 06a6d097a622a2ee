"""Multi-chip sharding tests on the 8-virtual-device CPU mesh:
sharded MSM/NTT/EdDSA match single-chip and host results bit-exactly."""

import numpy as np
import pytest

from bazuka_tpu.crypto import bls12_381 as bls
from bazuka_tpu.crypto import jubjub as jj
from bazuka_tpu.fields.host import FR_MODULUS
from bazuka_tpu.fields.limbs import fr_field
from bazuka_tpu.ops import ntt as nttm
from bazuka_tpu.parallel import (
    eddsa_verify_sharded,
    make_mesh,
    msm_sharded_host,
    ntt_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    import jax

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_msm_sharded_matches_naive(mesh):
    rng = np.random.default_rng(0)
    n = 16
    pts = [bls.g1_mul(bls.G1_GEN, int(k)) for k in rng.integers(1, 2**30, size=n)]
    scalars = [int(s) for s in rng.integers(0, 2**62, size=n)]
    want = None
    for p, s in zip(pts, scalars):
        want = bls.g1_add(want, bls.g1_mul(p, s))
    got = msm_sharded_host(mesh, pts, scalars, c=4, nbits=64)
    assert got == want


def test_ntt_sharded_matches_host(mesh):
    F = fr_field("jax")
    rng = np.random.default_rng(1)
    vals = [int(x) for x in rng.integers(0, 2**63, size=64)]
    enc = F.xp.asarray(F.encode(np.array(vals, dtype=object)))
    out = ntt_sharded(mesh, enc)
    got = [int(v) for v in F.decode(np.asarray(out))]
    assert got == nttm.ntt_host(vals)


def test_eddsa_sharded(mesh):
    pks, msgs, sigs = [], [], []
    for i in range(5):
        pk, sk = jj.JubJub.generate_keys(bytes([i]))
        sigs.append(jj.JubJub.sign(sk, 777 + i))
        pks.append(pk.decompress())
        msgs.append(777 + i)
    msgs[2] = 999  # tamper one
    ok = eddsa_verify_sharded(mesh, pks, msgs, sigs)
    assert list(ok) == [True, True, False, True, True]

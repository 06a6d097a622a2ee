"""Groth16 parameter generation (dev/test mode, deterministic).

Mirrors the role of the reference's in-process `--dev` keygen
(reference: src/config/blockchain.rs:355-417, seeded ChaCha) — mainnet
uses externally-ceremonied keys, dev/test generates them from a seed.

All group exponentiations run as batched fixed-base multiplies on TPU
(`ops.weierstrass.batch_gen_mul`): every proving/verifying-key element
is scalar·G1 or scalar·G2, so keygen is ~4 batched kernel launches.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import List, Optional

from ..crypto import bls12_381 as bls
from ..fields.host import FR_MODULUS
from ..ops import weierstrass as wst
from ..zk.proof import G1Wire, G2Wire, Groth16VerifyingKey
from . import qap
from .r1cs import ConstraintSystem

P = FR_MODULUS
R = bls.R


def _rng_scalars(seed: bytes, n: int, tag: bytes) -> List[int]:
    """Deterministic nonzero Fr scalars from a seed (SHA3 stream)."""
    out = []
    counter = 0
    while len(out) < n:
        h = hashlib.sha3_256(seed + tag + counter.to_bytes(8, "little")).digest()
        v = int.from_bytes(h, "little") % R
        if v != 0:
            out.append(v)
        counter += 1
    return out


@dataclass
class ProvingKey:
    """Host affine point arrays (None = infinity).  Device encodings are
    cached lazily by the prover."""

    alpha_g1: bls.G1Point
    beta_g1: bls.G1Point
    beta_g2: bls.G2Point
    delta_g1: bls.G1Point
    delta_g2: bls.G2Point
    a_query: List[bls.G1Point]
    b_g1_query: List[bls.G1Point]
    b_g2_query: List[bls.G2Point]
    h_query: List[bls.G1Point]
    l_query: List[bls.G1Point]  # aux variables only
    num_inputs: int = 0
    _device_cache: dict = field(default_factory=dict, repr=False)


@dataclass
class Parameters:
    pk: ProvingKey
    vk: Groth16VerifyingKey


def g1_wire(p: bls.G1Point) -> G1Wire:
    if p is None:
        return G1Wire(0, 1, True)
    return G1Wire(p[0], p[1], False)


def g2_wire(p: bls.G2Point) -> G2Wire:
    if p is None:
        return G2Wire((0, 0), (1, 0), True)
    return G2Wire(p[0], p[1], False)


def wire_g1(w: G1Wire) -> bls.G1Point:
    return None if w.infinity else (w.x, w.y)


def wire_g2(w: G2Wire) -> bls.G2Point:
    return None if w.infinity else (tuple(w.x), tuple(w.y))


def generate_parameters(
    cs: ConstraintSystem, seed: bytes = b"bazuka-tpu-dev", backend: str = "jax"
) -> Parameters:
    """Deterministic Groth16 setup for the circuit recorded in `cs`."""
    num_vars, n_inputs, A, B, C, _ = cs.reindexed()
    tau, alpha, beta, gamma, delta = _rng_scalars(seed, 5, b"toxic")
    u, v, w, z_tau = qap.evaluate_qap_at_tau(A, B, C, num_vars, n_inputs, tau)
    d = qap.domain_size(len(A), n_inputs)

    gamma_inv = pow(gamma, -1, R)
    delta_inv = pow(delta, -1, R)

    # per-variable combined scalar (beta u + alpha v + w)
    combo = [(beta * u[i] + alpha * v[i] + w[i]) % R for i in range(num_vars)]
    ic_scalars = [combo[i] * gamma_inv % R for i in range(n_inputs)]
    l_scalars = [combo[i] * delta_inv % R for i in range(n_inputs, num_vars)]

    # h query scalars: tau^i * Z(tau) / delta, i in 0..d-2
    h_scalars = []
    acc = z_tau * delta_inv % R
    for _ in range(d - 1):
        h_scalars.append(acc)
        acc = acc * tau % R

    # one batched fixed-base launch per group
    g1_scalars = (
        [alpha, beta, delta]
        + u
        + v
        + ic_scalars
        + l_scalars
        + h_scalars
    )
    g1_pts = wst.batch_gen_mul_host(g1_scalars, "g1", backend)
    off = 0

    def take(n):
        nonlocal off
        out = g1_pts[off : off + n]
        off += n
        return out

    alpha_g1, beta_g1, delta_g1 = take(3)
    a_query = take(num_vars)
    b_g1_query = take(num_vars)
    ic = take(n_inputs)
    l_query = take(num_vars - n_inputs)
    h_query = take(d - 1)

    g2_pts = wst.batch_gen_mul_host([beta, gamma, delta] + v, "g2", backend)
    beta_g2, gamma_g2, delta_g2 = g2_pts[:3]
    b_g2_query = g2_pts[3:]

    pk = ProvingKey(
        alpha_g1=alpha_g1,
        beta_g1=beta_g1,
        beta_g2=beta_g2,
        delta_g1=delta_g1,
        delta_g2=delta_g2,
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        h_query=h_query,
        l_query=l_query,
        num_inputs=n_inputs,
    )
    vk = Groth16VerifyingKey(
        alpha_g1=g1_wire(alpha_g1),
        beta_g1=g1_wire(beta_g1),
        beta_g2=g2_wire(beta_g2),
        gamma_g2=g2_wire(gamma_g2),
        delta_g1=g1_wire(delta_g1),
        delta_g2=g2_wire(delta_g2),
        ic=[g1_wire(p) for p in ic],
    )
    return Parameters(pk=pk, vk=vk)

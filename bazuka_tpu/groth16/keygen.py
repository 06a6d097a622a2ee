"""Groth16 parameter generation — device-vectorized, mainnet scale.

Mirrors the role of the reference's in-process `--dev` keygen
(reference: src/config/blockchain.rs:355-417, seeded ChaCha) — mainnet
uses externally-ceremonied keys, dev/test generates them from a seed.

v2 pipeline (no per-variable Python loops anywhere):
  1. u_i(τ), v_i(τ), w_i(τ) per variable via the device sparse
     column-eval (groth16.sparse.DeviceR1CS.eval_cols) — one gather +
     Montgomery-multiply + segmented-modular-sum per matrix
  2. per-variable scalar algebra ((βu+αv+w)/γ or /δ, τ^i·Z(τ)/δ) as
     batched device Montgomery ops
  3. every key element is scalar·G1 or scalar·G2: chunked windowed
     fixed-base multiplies (ops.weierstrass.batch_gen_mul, 32 table adds
     per scalar)
  4. G1 query arrays stay ON DEVICE in limb-major (3, 24, N) form —
     exactly what the v2 MSM consumes — and are never round-tripped
     through host affine decoding (round 1 spent minutes per key there)
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..crypto import bls12_381 as bls
from ..fields.host import FR_MODULUS
from ..fields.limbs import fr_field
from ..ops import weierstrass as wst
from ..ops.weierstrass import g1_proj_to_am
from ..zk.proof import G1Wire, G2Wire, Groth16VerifyingKey
from . import qap
from .r1cs import ConstraintSystem
from .sparse import DeviceR1CS

P = FR_MODULUS
R = bls.R

GEN_CHUNK = 1 << 16  # fixed-base batch per device dispatch


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
    """G1 query arrays are device-resident limb-major (3, 24, N)
    projective Montgomery tensors (the v2 MSM layout); the G2 query is a
    projective tuple of Fp2 coordinate pairs.  Singleton points are host
    affine."""

    alpha_g1: bls.G1Point
    beta_g1: bls.G1Point
    beta_g2: bls.G2Point
    delta_g1: bls.G1Point
    delta_g2: bls.G2Point
    a_query: object  # ((Np, 2, 24) affine, (Np,) inf mask)
    b_g1_query: object  # ((Np, 2, 24), (Np,))
    b_g2_query: object  # ((Np, 4, 24) Fp2 affine, (Np,) inf mask)
    h_query: object  # ((Np, 2, 24), (Np,))
    l_query: object  # ((Np, 2, 24), (Np,)) — aux slots first
    num_inputs: int = 0


@dataclass
class Parameters:
    pk: ProvingKey
    vk: Groth16VerifyingKey
    dev_r1cs: Optional[DeviceR1CS] = field(default=None, repr=False)


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


def _gen_mul_chunked(scalars_std, kind: str, backend: str):
    """(M, 16) std-form device scalars -> projective tuple with leading
    axis M, dispatched in GEN_CHUNK batches (bounds live memory and jit
    shape count; the tail chunk is padded to the chunk size)."""
    F = fr_field(backend)
    xp = F.xp
    M = int(scalars_std.shape[0])
    chunk = min(GEN_CHUNK, max(256, M))
    outs = []
    for lo in range(0, M, chunk):
        sl = scalars_std[lo : lo + chunk]
        if sl.shape[0] < chunk:
            pad = xp.zeros((chunk - sl.shape[0], sl.shape[1]), sl.dtype)
            sl = xp.concatenate([sl, pad], axis=0)
        outs.append(wst.batch_gen_mul(sl, kind, backend))

    def cat(parts):
        if isinstance(parts[0], tuple):
            return tuple(cat([p[i] for p in parts]) for i in range(2))
        return xp.concatenate(parts, axis=0)[:M] if len(parts) > 1 else parts[0][:M]

    return tuple(cat([o[ci] for o in outs]) for ci in range(3))


def _decode_g1_slice(proj, lo: int, hi: int) -> List[bls.G1Point]:
    sl = tuple(np.asarray(c[lo:hi]) for c in proj)
    return wst.g1_from_proj(wst.fp_ops("np"), sl)


def _decode_g2_slice(proj, lo: int, hi: int) -> List[bls.G2Point]:
    sl = tuple(tuple(np.asarray(x[lo:hi]) for x in c) for c in proj)
    return wst.g2_from_proj(wst.fp2_ops("np"), sl)


def generate_parameters(
    cs: ConstraintSystem, seed: bytes = b"bazuka-tpu-dev", backend: str = "jax"
) -> Parameters:
    """Deterministic Groth16 setup for the circuit recorded in `cs`."""
    comp = cs.compiled()
    dev = DeviceR1CS(comp, backend)
    num_vars, n_inputs = comp.num_vars, comp.num_inputs
    tau, alpha, beta, gamma, delta = _rng_scalars(seed, 5, b"toxic")
    d = qap.domain_size(comp.n_constraints, n_inputs)

    F = fr_field(backend)
    xp = F.xp

    # Lagrange values at tau over the size-d domain (host, then device)
    L = qap.lagrange_at(tau, d)
    L_mont = F.xp.asarray(
        F.encode(np.array(L[: dev.n_rows], dtype=object), mont=True)
    )
    u_m, v_m, w_m = dev.eval_cols(L_mont)  # (num_vars, 16) mont each

    gamma_inv = pow(gamma, -1, R)
    delta_inv = pow(delta, -1, R)
    z_tau = (pow(tau, d, P) - 1) % P

    # combo_i = beta*u_i + alpha*v_i + w_i; then /gamma (inputs), /delta (aux)
    beta_c = F.const_mont(beta)[None]
    alpha_c = F.const_mont(alpha)[None]
    combo = F.add(
        F.add(F.mont_mul(u_m, beta_c), F.mont_mul(v_m, alpha_c)), w_m
    )
    ic_m = F.mont_mul(combo[:n_inputs], F.const_mont(gamma_inv)[None])
    l_m = F.mont_mul(combo[n_inputs:], F.const_mont(delta_inv)[None])

    # h query scalars: tau^i * Z(tau)/delta, i in 0..d-2 (host geometric)
    h_scalars = []
    acc = z_tau * delta_inv % R
    for _ in range(d - 1):
        h_scalars.append(acc)
        acc = acc * tau % R
    h_std = xp.asarray(F.encode(np.array(h_scalars, dtype=object), mont=False))

    # assemble ONE standard-form G1 scalar array and multiply in chunks
    head_std = xp.asarray(
        F.encode(np.array([alpha, beta, delta], dtype=object), mont=False)
    )
    u_std = F.from_mont(u_m)
    v_std = F.from_mont(v_m)
    ic_std = F.from_mont(ic_m)
    l_std = F.from_mont(l_m)
    g1_scalars = xp.concatenate([head_std, u_std, v_std, ic_std, l_std, h_std])
    g1_proj = _gen_mul_chunked(g1_scalars, "g1", backend)
    # ONE batched Fermat inversion converts every G1 query point to the
    # point-major affine form the mixed-add MSM consumes
    am_all, inf_all = g1_proj_to_am(g1_proj, backend)

    off = [0]
    # all G1 queries share one padded length -> the prover's 4 G1 MSMs
    # share ONE compiled device program (ops.pallas_msm.msm_pad_len)
    from ..ops.pallas_msm import msm_pad_len

    Np = msm_pad_len(max(num_vars, d - 1))

    def take_am(n):
        lo = off[0]
        off[0] = lo + n
        am = xp.concatenate(
            [am_all[lo : lo + n],
             xp.zeros((Np - n,) + am_all.shape[1:], am_all.dtype)]
        )
        inf = xp.concatenate(
            [inf_all[lo : lo + n],
             xp.ones((Np - n,), inf_all.dtype)]
        )
        return (am, inf)

    head_pts = _decode_g1_slice(g1_proj, 0, 3)
    off[0] = 3
    alpha_g1, beta_g1, delta_g1 = head_pts
    a_query = take_am(num_vars)
    b_g1_query = take_am(num_vars)
    ic_lo = off[0]
    off[0] += n_inputs
    ic_pts = _decode_g1_slice(g1_proj, ic_lo, ic_lo + n_inputs)
    l_query = take_am(num_vars - n_inputs)
    h_query = take_am(d - 1)

    # G2: [beta, gamma, delta] + v
    g2_scalars = xp.concatenate(
        [
            xp.asarray(
                F.encode(np.array([beta, gamma, delta], dtype=object), mont=False)
            ),
            v_std,
        ]
    )
    g2_proj = _gen_mul_chunked(g2_scalars, "g2", backend)
    beta_g2, gamma_g2, delta_g2 = _decode_g2_slice(g2_proj, 0, 3)
    # point-major affine (Np, 4, 24) + infinity mask — the v2 G2 MSM
    # layout (one batched Fp2 inversion); padded to Np like the G1
    # queries so the G2 MSM shares the prover's (Np, 16) scalar arrays
    g2_tail = tuple(tuple(x[3:] for x in c) for c in g2_proj)
    am4, inf4 = wst.g2_proj_to_am(g2_tail, backend)
    n_pad = Np - num_vars
    b_g2_query = (
        xp.concatenate(
            [am4, xp.zeros((n_pad,) + am4.shape[1:], am4.dtype)]
        ),
        xp.concatenate([inf4, xp.ones((n_pad,), inf4.dtype)]),
    )

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
        ic=[g1_wire(p) for p in ic_pts],
    )
    return Parameters(pk=pk, vk=vk, dev_r1cs=dev)


# ------------------------------------------------------------ persistence


def save_parameters(params: Parameters, path: str) -> None:
    """Serialize Parameters to one .npz: device query tensors as numpy
    arrays + a pickled header for the host singleton points and the VK.
    (Mirrors the reference's on-disk ceremony params consumed at
    src/config/blockchain.rs:31-38 — mainnet provers load keys, they
    don't regenerate them.)"""
    import pickle

    pk = params.pk
    head = {
        "alpha_g1": pk.alpha_g1,
        "beta_g1": pk.beta_g1,
        "beta_g2": pk.beta_g2,
        "delta_g1": pk.delta_g1,
        "delta_g2": pk.delta_g2,
        "num_inputs": pk.num_inputs,
        "vk": params.vk,
    }
    arrs = {"head": np.frombuffer(pickle.dumps(head), np.uint8)}
    for name in ("a_query", "b_g1_query", "l_query", "h_query"):
        am, inf = getattr(pk, name)
        arrs[name + "_am"] = np.asarray(am)
        arrs[name + "_inf"] = np.asarray(inf)
    arrs["b_g2_am"] = np.asarray(pk.b_g2_query[0])
    arrs["b_g2_inf"] = np.asarray(pk.b_g2_query[1])
    np.savez(path, **arrs)


def load_parameters(path: str, backend: str = "jax") -> Parameters:
    """Inverse of save_parameters; query tensors go back on device."""
    import pickle

    from ..fields.limbs import fp_field

    xp = fp_field(backend).xp
    z = np.load(path)
    head = pickle.loads(z["head"].tobytes())
    qs = {
        name: (xp.asarray(z[name + "_am"]), xp.asarray(z[name + "_inf"]))
        for name in ("a_query", "b_g1_query", "l_query", "h_query")
    }
    b_g2 = (xp.asarray(z["b_g2_am"]), xp.asarray(z["b_g2_inf"]))
    pk = ProvingKey(
        alpha_g1=head["alpha_g1"],
        beta_g1=head["beta_g1"],
        beta_g2=head["beta_g2"],
        delta_g1=head["delta_g1"],
        delta_g2=head["delta_g2"],
        a_query=qs["a_query"],
        b_g1_query=qs["b_g1_query"],
        b_g2_query=b_g2,
        h_query=qs["h_query"],
        l_query=qs["l_query"],
        num_inputs=head["num_inputs"],
    )
    return Parameters(pk=pk, vk=head["vk"])

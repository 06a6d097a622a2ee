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


def _gen_mul_am_host(scalars_std, kind: str, backend: str,
                     out_am=None, out_inf=None, out_lo: int = 0):
    """Streamed fixed-base multiply for mainnet-scale keys: each
    GEN_CHUNK batch is multiplied, batch-inverted to point-major affine
    ON DEVICE, then offloaded to HOST numpy — device live-set stays
    O(chunk) no matter how many millions of key elements are generated
    (an all-resident (56M, 3, 24) projective tensor at batch=256 would
    be ~16 GB of HBM by itself).  Writes into out_am/out_inf at out_lo
    if given (zero-copy assembly of padded query arrays), else
    allocates.  Returns host (M, n_aff, 24) uint32 + (M,) uint32."""
    F = fr_field(backend)
    xp = F.xp
    M = int(scalars_std.shape[0])
    chunk = min(GEN_CHUNK, max(256, M))
    n_aff = 2 if kind == "g1" else 4
    if out_am is None:
        out_am = np.zeros((M, n_aff, 24), np.uint32)
        out_inf = np.ones((M,), np.uint32)
        out_lo = 0
    to_am = g1_proj_to_am if kind == "g1" else wst.g2_proj_to_am
    for lo in range(0, M, chunk):
        sl = xp.asarray(scalars_std[lo : lo + chunk])
        n = int(sl.shape[0])
        if n < chunk:
            pad = xp.zeros((chunk - n, sl.shape[1]), sl.dtype)
            sl = xp.concatenate([sl, pad], axis=0)
        proj = wst.batch_gen_mul(sl, kind, backend)
        am, inf = to_am(proj, backend)
        out_am[out_lo + lo : out_lo + lo + n] = np.asarray(am)[:n]
        out_inf[out_lo + lo : out_lo + lo + n] = np.asarray(inf)[:n]
    return out_am, out_inf


def _decode_g1_am(am: np.ndarray, inf: np.ndarray) -> List[bls.G1Point]:
    """Host point-major affine Montgomery rows -> host affine points."""
    from ..fields.limbs import fp_field

    F = fp_field("np")
    xs = F.decode(am[:, 0, :])
    ys = F.decode(am[:, 1, :])
    return [
        None if i else (int(x), int(y))
        for x, y, i in zip(xs, ys, inf)
    ]


def _decode_g2_am(am: np.ndarray, inf: np.ndarray) -> List[bls.G2Point]:
    from ..fields.limbs import fp_field

    F = fp_field("np")
    c = [F.decode(am[:, k, :]) for k in range(4)]
    return [
        None if i else (
            (int(c[0][j]), int(c[1][j])), (int(c[2][j]), int(c[3][j]))
        )
        for j, i in enumerate(inf)
    ]


def _decode_g1_slice(proj, lo: int, hi: int) -> List[bls.G1Point]:
    sl = tuple(np.asarray(c[lo:hi]) for c in proj)
    return wst.g1_from_proj(wst.fp_ops("np"), sl)


def _decode_g2_slice(proj, lo: int, hi: int) -> List[bls.G2Point]:
    sl = tuple(tuple(np.asarray(x[lo:hi]) for x in c) for c in proj)
    return wst.g2_from_proj(wst.fp2_ops("np"), sl)


def generate_parameters(
    cs: ConstraintSystem, seed: bytes = b"bazuka-tpu-dev",
    backend: str = "jax", device_queries: Optional[bool] = None,
) -> Parameters:
    """Deterministic Groth16 setup for the circuit recorded in `cs`.

    Query arrays are assembled HOST-side (the fixed-base multiplies
    stream GEN_CHUNK batches through the device and offload affine
    rows), then uploaded to the device iff they fit comfortably —
    device_queries=None auto-selects by padded length: <= 2^21 all
    five resident; <= 2^22 the four G1 queries resident and the G2
    query streamed per proof ("g1"); above that (the batch=256 mainnet
    circuit's 2^24) all host-side, prover uploads per MSM with async
    prefetch."""
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
    h_std = F.encode(np.array(h_scalars, dtype=object), mont=False)
    del h_scalars

    head_std = F.encode(
        np.array([alpha, beta, delta], dtype=object), mont=False
    )
    u_std = np.asarray(F.from_mont(u_m))
    v_std = np.asarray(F.from_mont(v_m))
    ic_std = np.asarray(F.from_mont(ic_m))
    l_std = np.asarray(F.from_mont(l_m))
    del u_m, v_m, w_m, combo, ic_m, l_m  # free device HBM before gen muls

    # all G1 queries share one padded length -> the prover's 4 G1 MSMs
    # share ONE compiled device program (ops.pallas_msm.msm_pad_len);
    # each query is streamed through the device in GEN_CHUNK batches and
    # assembled directly into its padded host array (pad rows are
    # infinity; inf masks start all-ones)
    from ..ops.pallas_msm import msm_pad_len

    Np = msm_pad_len(max(num_vars, d - 1))

    def make_query(scalars, n):
        assert scalars.shape[0] == n, (scalars.shape, n)
        am = np.zeros((Np, 2, 24), np.uint32)
        inf = np.ones((Np,), np.uint32)
        _gen_mul_am_host(scalars, "g1", backend, am, inf, 0)
        return (am, inf)

    head_am, head_inf = _gen_mul_am_host(head_std, "g1", backend)
    alpha_g1, beta_g1, delta_g1 = _decode_g1_am(head_am, head_inf)
    a_query = make_query(u_std, num_vars)
    b_g1_query = make_query(v_std, num_vars)
    ic_am, ic_inf = _gen_mul_am_host(ic_std, "g1", backend)
    ic_pts = _decode_g1_am(ic_am, ic_inf)
    l_query = make_query(l_std, num_vars - n_inputs)
    h_query = make_query(h_std, d - 1)

    # G2: [beta, gamma, delta] head + v tail, same streamed assembly
    g2_head_std = F.encode(
        np.array([beta, gamma, delta], dtype=object), mont=False
    )
    g2h_am, g2h_inf = _gen_mul_am_host(g2_head_std, "g2", backend)
    beta_g2, gamma_g2, delta_g2 = _decode_g2_am(g2h_am, g2h_inf)
    b_g2_am = np.zeros((Np, 4, 24), np.uint32)
    b_g2_inf = np.ones((Np,), np.uint32)
    _gen_mul_am_host(v_std, "g2", backend, b_g2_am, b_g2_inf, 0)
    b_g2_query = (b_g2_am, b_g2_inf)

    if device_queries is None:
        # Residency budget (16 GB chip): resident queries are stored
        # NARROW (uint16 limb payloads / uint8 flags — half the uint32
        # kernel layout; prove.py widens per MSM).  All five narrow
        # queries at 2^22 are ~2.4 GB; at 2^23 the four G1 queries are
        # ~3.2 GB with the 1.6 GB G2 streamed ("g1" mode); above that
        # (the batch=256 mainnet circuit's 2^24) all host-side, prover
        # uploads narrow per MSM with async prefetch.
        device_queries = (
            True if Np <= (1 << 22) else "g1" if Np <= (1 << 23) else False
        )

    def _narrow_resident(q):
        am, inf = q
        return (
            xp.asarray(np.asarray(am, dtype=np.uint16)),
            xp.asarray(np.asarray(inf, dtype=np.uint8)),
        )

    if device_queries:
        a_query = _narrow_resident(a_query)
        b_g1_query = _narrow_resident(b_g1_query)
        l_query = _narrow_resident(l_query)
        h_query = _narrow_resident(h_query)
        if device_queries != "g1":
            b_g2_query = _narrow_resident(b_g2_query)

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


def _pk_head(params: Parameters) -> dict:
    pk = params.pk
    return {
        "alpha_g1": pk.alpha_g1,
        "beta_g1": pk.beta_g1,
        "beta_g2": pk.beta_g2,
        "delta_g1": pk.delta_g1,
        "delta_g2": pk.delta_g2,
        "num_inputs": pk.num_inputs,
        "vk": params.vk,
    }


_QUERY_NAMES = ("a_query", "b_g1_query", "l_query", "h_query", "b_g2_query")


def save_parameters(params: Parameters, path: str) -> None:
    """Serialize Parameters: query tensors + a pickled header for the
    host singleton points and the VK.  (Mirrors the reference's on-disk
    ceremony params consumed at src/config/blockchain.rs:31-38 —
    mainnet provers load keys, they don't regenerate them.)

    Two layouts by `path`:
      * `*.npz` — one zip archive; fine up to a few GB.
      * anything else — a DIRECTORY of raw .npy files.  The mainnet
        batch=256 key is ~19 GB; zip CRC32 + single-stream write makes
        npz minutes-slow there, and raw .npy writes at disk bandwidth
        and loads back via memory-mapping (zero-copy until the prover
        uploads each query)."""
    import pickle

    pk = params.pk
    head = _pk_head(params)
    if path.endswith(".npz"):
        arrs = {"head": np.frombuffer(pickle.dumps(head), np.uint8)}
        for name in _QUERY_NAMES:
            am, inf = getattr(pk, name)
            arrs[name + "_am"] = np.asarray(am)
            arrs[name + "_inf"] = np.asarray(inf)
        np.savez(path, **arrs)
        return
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "head.pkl"), "wb") as f:
        pickle.dump(head, f)
    for name in _QUERY_NAMES:
        am, inf = getattr(pk, name)
        # NARROW on disk: limb payloads are 16-bit (W=16 Montgomery) and
        # flags are 0/1, so uint16/uint8 halves the ~19 GB mainnet key
        # AND the per-proof disk reads; the prover widens on device.
        np.save(os.path.join(path, name + "_am.npy"),
                np.asarray(am, dtype=np.uint16))
        np.save(os.path.join(path, name + "_inf.npy"),
                np.asarray(inf, dtype=np.uint8))


def load_parameters(path: str, backend: str = "jax",
                    device_queries: Optional[bool] = None) -> Parameters:
    """Inverse of save_parameters (both layouts).  device_queries=None
    auto-selects the generate_parameters three-way policy: padded length
    <= 2^22 all five queries narrow-resident; <= 2^23 the four G1
    queries resident with the G2 query host-streamed ("g1"); above that
    all host-side (directory layout: memory-mapped) and the prover
    uploads narrow per MSM."""
    import os
    import pickle

    from ..fields.limbs import fp_field

    xp = fp_field(backend).xp
    if path.endswith(".npz"):
        z = np.load(path)
        head = pickle.loads(z["head"].tobytes())
        if "b_g2_query_am" not in z.files:  # pre-round-4 key names
            z = {k: z[k] for k in z.files}
            z["b_g2_query_am"] = z.pop("b_g2_am")
            z["b_g2_query_inf"] = z.pop("b_g2_inf")
    else:
        with open(os.path.join(path, "head.pkl"), "rb") as f:
            head = pickle.load(f)
        z = {
            name + suf: np.load(os.path.join(path, name + suf + ".npy"),
                                mmap_mode="r")
            for name in _QUERY_NAMES
            for suf in ("_am", "_inf")
        }
    if device_queries is None:
        Np = z["a_query_inf"].shape[0]
        device_queries = (
            True if Np <= (1 << 22) else "g1" if Np <= (1 << 23) else False
        )

    def up_dev(a):  # device-RESIDENT: narrow (prove.py widens per MSM)
        dt = np.uint8 if a.ndim == 1 else np.uint16
        return xp.asarray(np.asarray(a, dtype=dt))

    up = up_dev if device_queries else np.asarray
    up_g2 = up_dev if device_queries is True else np.asarray
    qs = {
        name: (up(z[name + "_am"]), up(z[name + "_inf"]))
        for name in ("a_query", "b_g1_query", "l_query", "h_query")
    }
    b_g2 = (up_g2(z["b_g2_query_am"]), up_g2(z["b_g2_query_inf"]))
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

"""Groth16 prover: QAP witness reduction on TPU NTTs + MSMs.

Pipeline (bellman-equivalent math, TPU execution; SURVEY.md §3.2):
  1. evaluate a_j, b_j, c_j per extended constraint row (sparse matvec)
  2. h(x) = (a(x)·b(x) − c(x)) / Z(x) via 3 iNTT + 3 coset NTT + 1 coset
     iNTT on device — on the coset gH, Z ≡ g^d − 1 is a CONSTANT, so the
     division is one batched multiply
  3. A = α + Σ z_i u_i(τ) + rδ;  B = β + Σ z_i v_i(τ) + sδ;
     C = (Σ_aux z_i L_i + Σ h_i H_i) + sA + rB₁ − rsδ
     — 4 G1 MSMs + 1 G2 MSM (`ops.msm`)
"""

from __future__ import annotations

import secrets
from typing import List, Optional

import numpy as np

from ..crypto import bls12_381 as bls
from ..fields.host import FR_GENERATOR, FR_MODULUS
from ..fields.limbs import fr_field
from ..ops import msm as msm_mod
from ..ops import ntt as ntt_mod
from ..ops import weierstrass as wst
from ..zk.proof import Groth16Proof
from . import qap
from .keygen import Parameters, g1_wire, g2_wire
from .r1cs import ConstraintSystem, SynthesisError

P = FR_MODULUS


def _eval_rows(rows, assignment) -> List[int]:
    out = []
    for row in rows:
        acc = 0
        for var, coeff in row.items():
            acc += assignment[var] * coeff
        out.append(acc % P)
    return out


def _pad_len(n: int) -> int:
    """Next power of two (min 16) — MSM kernels compile per size, so all
    query arrays are padded to pow2 lengths for shape reuse."""
    p = 16
    while p < n:
        p *= 2
    return p


def _device_points(pk, name: str, kind: str, backend: str):
    key = (name, backend)
    if key not in pk._device_cache:
        pts = list(getattr(pk, name))
        pts += [None] * (_pad_len(len(pts)) - len(pts))
        if kind == "g1":
            pk._device_cache[key] = wst.g1_to_proj(wst.fp_ops(backend), pts)
        else:
            pk._device_cache[key] = wst.g2_to_proj(wst.fp2_ops(backend), pts)
    return pk._device_cache[key]


def _pad_scalars(Fr, arr, n: int):
    pad = n - arr.shape[0]
    if pad == 0:
        return arr
    return Fr.xp.concatenate(
        [arr, Fr.xp.zeros((pad, arr.shape[1]), arr.dtype)], axis=0
    )


def _msm_host_out(P_dev, scalars_std, kind, backend):
    R = msm_mod.msm(P_dev, scalars_std, kind, backend)
    if kind == "g1":
        R = tuple(np.asarray(x)[None] for x in R)
        return wst.g1_from_proj(wst.fp_ops("np"), R)[0]
    R = tuple(tuple(np.asarray(x)[None] for x in c) for c in R)
    return wst.g2_from_proj(wst.fp2_ops("np"), R)[0]


def compute_h(a_evals, b_evals, c_evals, d: int, backend: str = "jax"):
    """h(x) coefficients (length d-1) as standard-form limb array, on device."""
    F = fr_field(backend)
    enc = lambda vals: F.xp.asarray(F.encode(np.array(vals, dtype=object)))
    ea, eb, ec = enc(a_evals), enc(b_evals), enc(c_evals)
    # interpolate then re-evaluate on the coset gH
    ca = ntt_mod.coset_ntt_mont(ntt_mod.ntt_mont(ea, True, backend), backend)
    cb = ntt_mod.coset_ntt_mont(ntt_mod.ntt_mont(eb, True, backend), backend)
    cc = ntt_mod.coset_ntt_mont(ntt_mod.ntt_mont(ec, True, backend), backend)
    z_on_coset = (pow(FR_GENERATOR, d, P) - 1) % P
    zinv = F.const_mont(pow(z_on_coset, -1, P))
    h_evals = F.mont_mul(F.sub(F.mont_mul(ca, cb), cc), zinv[None])
    h_coeffs = ntt_mod.coset_intt_mont(h_evals, backend)
    # degree ≤ d-2: drop the top coefficient, return standard form for MSM
    return F.from_mont(h_coeffs[: d - 1])


def create_proof(
    params: Parameters,
    cs: ConstraintSystem,
    r: Optional[int] = None,
    s: Optional[int] = None,
    backend: str = "jax",
) -> Groth16Proof:
    pk = params.pk
    num_vars, n_inputs, A, B, C, assignment = cs.reindexed()
    if any(v is None for v in assignment):
        raise SynthesisError("constraint system not in proving mode")
    if r is None:
        r = secrets.randbelow(bls.R)
    if s is None:
        s = secrets.randbelow(bls.R)

    d = qap.domain_size(len(A), n_inputs)
    Ae, Be, Ce = qap.extend_matrices(A, B, C, n_inputs)
    a_evals = _eval_rows(Ae, assignment) + [0] * (d - len(Ae))
    b_evals = _eval_rows(Be, assignment) + [0] * (d - len(Be))
    c_evals = _eval_rows(Ce, assignment) + [0] * (d - len(Ce))

    h_std = compute_h(a_evals, b_evals, c_evals, d, backend)

    Fr = fr_field(backend)
    z_std = Fr.xp.asarray(
        Fr.encode(np.array(assignment, dtype=object), mont=False)
    )
    aux_std = z_std[n_inputs:]

    a_q = _device_points(pk, "a_query", "g1", backend)
    b1_q = _device_points(pk, "b_g1_query", "g1", backend)
    b2_q = _device_points(pk, "b_g2_query", "g2", backend)
    h_q = _device_points(pk, "h_query", "g1", backend)
    l_q = _device_points(pk, "l_query", "g1", backend)

    zf = _pad_scalars(Fr, z_std, _pad_len(num_vars))
    hf = _pad_scalars(Fr, h_std, _pad_len(d - 1))
    lf = _pad_scalars(Fr, aux_std, _pad_len(num_vars - n_inputs))
    sum_az = _msm_host_out(a_q, zf, "g1", backend)
    sum_bz_g1 = _msm_host_out(b1_q, zf, "g1", backend)
    sum_bz_g2 = _msm_host_out(b2_q, zf, "g2", backend)
    sum_h = _msm_host_out(h_q, hf, "g1", backend) if d > 1 else None
    sum_l = (
        _msm_host_out(l_q, lf, "g1", backend) if num_vars > n_inputs else None
    )

    g1a = bls.g1_add
    A_pt = g1a(g1a(pk.alpha_g1, sum_az), bls.g1_mul(pk.delta_g1, r))
    B1_pt = g1a(g1a(pk.beta_g1, sum_bz_g1), bls.g1_mul(pk.delta_g1, s))
    B2_pt = bls.g2_add(
        bls.g2_add(pk.beta_g2, sum_bz_g2), bls.g2_mul(pk.delta_g2, s)
    )
    C_pt = g1a(
        g1a(
            g1a(sum_l, sum_h),
            g1a(bls.g1_mul(A_pt, s), bls.g1_mul(B1_pt, r)),
        ),
        bls.g1_neg(bls.g1_mul(pk.delta_g1, r * s % bls.R)),
    )
    return Groth16Proof(a=g1_wire(A_pt), b=g2_wire(B2_pt), c=g1_wire(C_pt))

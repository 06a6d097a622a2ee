"""Mesh-parallel Groth16 prover (BASELINE config 5; SURVEY.md §2.3).

The reference's unit of distribution is a whole Groth16 job handed to a
worker over HTTP (reference: src/mpn/mod.rs:298-424); *within* one job
bellman splits FFT butterflies and Pippenger point ranges over rayon
cores.  This module is the TPU-native analog of that inner split: ONE
`create_proof` sharded over a `jax.sharding.Mesh`.

  * Every MSM (4 G1 + 1 G2) runs the PRODUCTION v3 balanced-drain
    program (`ops.pallas_msm._msm_program_v3`) per device over a
    contiguous point range (`shard_map`); bucket sums are additive over
    point subsets, so per-device window sums are partial results,
    tree-reduced ON DEVICE by log2(D) complete projective adds (the
    curve-group analog of `psum` — point addition is not elementwise,
    so the reduction is expressed as masked lane adds over the stacked
    partials and XLA lowers the movement to ICI collectives).  Only the
    final W-window double-and-add combine is host-side (W cheap adds).
  * The h(x) phase runs every transform on the Bailey four-step NTT
    (`parallel.ntt_four_step`): 3 explicit all_to_all transposes per
    transform instead of per-stage butterfly exchanges.  Coset
    evaluation/interpolation is the same elementwise g^i pre/post-scale
    the single-chip prover uses, computed on the sharded rows.
  * Duplicate-heavy witness scalars reuse the single-chip host dedup
    plan (`ops.pallas_msm.make_dedup_plan`).  Heavy groups are presummed
    from a HOST gather of just the heavy rows (Hp rows, not the Np-row
    query) and finished in a small replicated MSM; the sharded main
    drain sees zeroed heavy rows.  Per-shard plans would give every
    device a different program shape and break the single-program SPMD
    contract, so the split happens above the mesh.

Witness limb-encode and the sparse R1CS matvec stay replicated: both
are O(vars) elementwise work measured at ~1% of a mainnet proof
(PERFORMANCE.md stage breakdowns), far below a collective's worth.

Everything compiles and runs identically on an N-virtual-device CPU
mesh (tests / driver dryrun) and a real TPU slice.
"""

from __future__ import annotations

import functools
import secrets
from typing import Optional

import numpy as np

from ..fields.host import FR_GENERATOR, FR_MODULUS
from ..fields.limbs import fr_field
from ..ops import ntt as ntt_mod
from ..ops import pallas_msm as pm
from ..ops import weierstrass as wst
from . import ntt_four_step

P = FR_MODULUS


# ------------------------------------------------------------ sharded MSM


@functools.cache
def _reduce_parts_fn(kind: str, D: int, W: int, s_tile: int):
    """jit: (D, p, 24, W) per-device projective window partials ->
    (p, 24, W) via a log2(D) tree of masked complete adds (lane-major:
    the D axis is folded into lanes so each tree level is ONE fused
    add over D/2 * W lanes)."""
    import jax
    import jax.numpy as jnp

    addsel = pm.add_select_lm if kind == "g1" else pm.add_select_g2_lm

    def run(parts):
        # (D, p, 24, W) -> (p, 24, D*W) lane-major
        acc = parts.transpose(1, 2, 0, 3).reshape(parts.shape[1], 24, D * W)
        m = D
        while m > 1:
            half = m // 2
            lo = acc[:, :, : half * W]
            hi = acc[:, :, half * W: 2 * half * W]
            ones = jnp.ones(half * W, jnp.uint32)
            lo = addsel(lo, hi, ones, s_tile)
            if m % 2:  # odd m: carry the unpaired block through
                lo = jnp.concatenate([lo, acc[:, :, (m - 1) * W:]], axis=2)
                half += 1
            acc = lo
            m = half
        return acc  # (p, 24, W)

    return jax.jit(run)


def _combine_windows(wins_np: np.ndarray, kind: str, c: int) -> object:
    """(p, 24, W) projective window sums (host) -> host affine point."""
    from ..crypto import bls12_381 as bls

    n_windows = wins_np.shape[2]
    if kind == "g1":
        host_pts = wst.g1_from_proj(
            wst.fp_ops("np"), (wins_np[0].T, wins_np[1].T, wins_np[2].T)
        )
        add = bls.g1_add
    else:
        host_pts = wst.g2_from_proj(
            wst.fp2_ops("np"),
            ((wins_np[0].T, wins_np[1].T), (wins_np[2].T, wins_np[3].T),
             (wins_np[4].T, wins_np[5].T)),
        )
        add = bls.g2_add
    acc = None
    for w in range(n_windows - 1, -1, -1):
        for _ in range(c):
            acc = add(acc, acc)
        acc = add(acc, host_pts[w])
    return acc


def _presum_from_host(query, plan, kind: str, s_tile: int = 8):
    """Heavy-group presum when the query is HOST-side: gather only the
    Hp heavy rows on the host (free np fancy-index; Hp << Np) and run
    the presum kernel over that small upload with identity indices —
    the full query never lands on one device."""
    import jax.numpy as jnp

    am, inf = query
    gidx_np = np.concatenate(
        [plan.hpos,
         np.zeros(plan.Hp - plan.n_heavy_elems, np.int32)]
    )
    Ph = np.ascontiguousarray(np.asarray(am, np.uint32)[gidx_np])
    infh = np.asarray(inf, np.uint32)[gidx_np].copy()
    infh[plan.n_heavy_elems:] = 1  # pads never add (belt & braces)
    fn = (pm._g1_presum_fn if kind == "g1" else pm._g2_presum_am_fn)(
        plan.m, plan.Hp, plan.Ks, plan.fold_masks.shape[0], s_tile, False
    )
    acc = fn(jnp.asarray(Ph), jnp.asarray(infh),
             jnp.arange(plan.Hp, dtype=jnp.int32),
             jnp.asarray(plan.run_start), jnp.asarray(plan.run_len),
             jnp.asarray(plan.fold_masks))
    sums = acc[:, :, jnp.asarray(plan.first_lane)]
    if kind == "g1":
        return wst.g1_proj_to_am((sums[0].T, sums[1].T, sums[2].T), "jax")
    return wst.g2_proj_to_am(
        ((sums[0].T, sums[1].T), (sums[2].T, sums[3].T),
         (sums[4].T, sums[5].T)),
        "jax",
    )


def msm_sharded_v3(mesh, query, scalars_std, kind: str = "g1",
                   c: int = 12, nbits: int = 255, s_tile: int = 8,
                   chunk: int = 1 << 18, dedup_plan=None):
    """Production-pipeline sharded MSM: the v3 balanced drain per device
    over point ranges, window partials tree-reduced on device.

    query: ((Np, a, 24) affine limbs, (Np,) inf) — np (host key) or
    device arrays, any narrow/wide dtype; Np must divide by the mesh
    size.  scalars_std: (Np, 16) standard-form Fr limbs (np or device).
    Returns a host affine point (or None for the zero sum)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from ..crypto import bls12_381 as bls

    axis = mesh.axis_names[0]
    D = mesh.devices.size
    am, inf = query
    N = int(am.shape[0])
    assert N % D == 0, f"pad the MSM length ({N}) to the mesh size ({D})"

    if dedup_plan is not None and dedup_plan.active:
        plan = dedup_plan
        # heavy groups: presum + small replicated MSM (see module doc)
        if isinstance(am, np.ndarray):
            sum_am, sum_inf = _presum_from_host(query, plan, kind, s_tile)
        else:
            pres = pm.presum_g1 if kind == "g1" else pm.presum_g2_am
            sum_am, sum_inf = pres(
                am.astype(jnp.uint32), inf.astype(jnp.uint32), plan, s_tile
            )
        V = int(plan.heavy_scalars.shape[0])
        msm_small = pm.msm_lm if kind == "g1" else pm.msm_lm_g2
        extra = msm_small(sum_am, sum_inf, jnp.asarray(plan.heavy_scalars),
                          c=4 if V < (1 << 12) else 8, nbits=nbits,
                          s_tile=s_tile, chunk=chunk)
        del sum_am, sum_inf
        if isinstance(scalars_std, np.ndarray):
            scalars_std = jnp.asarray(scalars_std)
        scal = pm._zero_rows_fn()(scalars_std, jnp.asarray(plan.hpos))
        main = msm_sharded_v3(mesh, query, scal, kind=kind, c=c,
                              nbits=nbits, s_tile=s_tile, chunk=chunk)
        add = bls.g1_add if kind == "g1" else bls.g2_add
        if main is None:
            return extra
        return add(main, extra) if extra is not None else main

    run, n_windows = pm._msm_program_v3(
        N // D, c, nbits, s_tile, False, chunk, kind
    )

    if kind == "g2" and not pm._on_tpu():
        # WORKAROUND (round 5, measured): XLA:CPU miscompiles the G2 v3
        # drain under shard_map — per-device AFFINE window sums come out
        # wrong on every device while the IDENTICAL program run directly
        # per shard is bit-exact, G1 is bit-exact under the same
        # shard_map specs, and both G2 kernels (madd/add_select) pass
        # standalone under shard_map (eager shard_map fails identically,
        # so it is not the outer-jit GSPMD pass).  On the CPU
        # validation mesh the G2 per-shard drains therefore run as ONE
        # vmapped batch on one device (bit-identical per-shard math,
        # better intra-op threading than 8 sequential dispatches) and
        # feed the SAME device tree-reduce; the TPU path (Pallas
        # kernels, no jnp fallback) keeps the shard_map SPMD form below.
        import jax as _jax

        am_r = (jnp.asarray(np.asarray(am, np.uint32))
                if isinstance(am, np.ndarray)
                else am.astype(jnp.uint32)).reshape(D, N // D, -1, 24)
        inf_r = (jnp.asarray(np.asarray(inf, np.uint32))
                 if isinstance(inf, np.ndarray)
                 else inf.astype(jnp.uint32)).reshape(D, N // D)
        s_r = (jnp.asarray(np.asarray(scalars_std))
               if isinstance(scalars_std, np.ndarray)
               else scalars_std.astype(jnp.uint32)).reshape(D, N // D, 16)
        parts = _jax.vmap(run)(am_r, inf_r, s_r)  # (D, p, 24, W)
        reduced = _reduce_parts_fn(kind, D, n_windows, s_tile)(parts)
        return _combine_windows(np.asarray(reduced), kind, c)

    def local(P_shard, inf_shard, s_shard):
        # v3 derives validity from digit != 0: infinity rows must carry
        # zero scalars (keygen pads already do; enforce for the rest)
        s_shard = jnp.where(
            (inf_shard != 0)[:, None], jnp.zeros_like(s_shard), s_shard
        )
        return run(P_shard, inf_shard, s_shard)[None]

    shard = shard_map(
        local, mesh=mesh,
        in_specs=(PS(axis, None, None), PS(axis), PS(axis, None)),
        out_specs=PS(axis, None, None, None),
        check_rep=False,
    )
    sh_pts = NamedSharding(mesh, PS(axis, None, None))
    sh_inf = NamedSharding(mesh, PS(axis))
    sh_s = NamedSharding(mesh, PS(axis, None))
    # narrow-on-the-wire: host queries upload as uint16/uint8 shards and
    # widen on device (prove.py's tunnel discipline, here per shard)
    if isinstance(am, np.ndarray):
        am_d = jax.device_put(np.asarray(am, np.uint16)
                              if am.dtype == np.uint32 else am, sh_pts)
        inf_d = jax.device_put(np.asarray(inf, np.uint8)
                               if inf.dtype == np.uint32 else inf, sh_inf)
    else:
        am_d = jax.device_put(am, sh_pts)
        inf_d = jax.device_put(inf, sh_inf)
    s_d = jax.device_put(
        scalars_std if not isinstance(scalars_std, np.ndarray)
        else jnp.asarray(scalars_std), sh_s
    )

    @jax.jit
    def widen_run(am_d, inf_d, s_d):
        return shard(am_d.astype(jnp.uint32), inf_d.astype(jnp.uint32),
                     s_d.astype(jnp.uint32))

    parts = widen_run(am_d, inf_d, s_d)  # (D, p, 24, W) sharded
    reduced = _reduce_parts_fn(kind, D, n_windows, s_tile)(parts)
    return _combine_windows(np.asarray(reduced), kind, c)


# -------------------------------------------------------- sharded h phase


def coset_ntt_fs(mesh, x, backend: str = "jax"):
    """Coset evaluation on the four-step mesh NTT: elementwise g^i
    pre-scale (sharded rows) then `ntt_four_step`."""
    F = fr_field(backend)
    log_n = int(x.shape[0]).bit_length() - 1
    scaled = F.mont_mul(x, ntt_mod._coset_scale(log_n, False, backend))
    return ntt_four_step(mesh, scaled)


def coset_intt_fs(mesh, x, backend: str = "jax"):
    """Coset interpolation: `ntt_four_step` inverse then g^-i post-scale."""
    F = fr_field(backend)
    log_n = int(x.shape[0]).bit_length() - 1
    coeffs = ntt_four_step(mesh, x, inverse=True)
    return F.mont_mul(coeffs, ntt_mod._coset_scale(log_n, True, backend))


def _mesh_fits_fourstep(d: int, D: int) -> bool:
    log_n = d.bit_length() - 1
    log_c = log_n // 2
    return d >= 2 and (1 << log_c) % D == 0 and (1 << (log_n - log_c)) % D == 0


def compute_h_sharded(mesh, evs: list, d: int, backend: str = "jax"):
    """Mesh h(x): same math as groth16.prove.compute_h_mont but every
    transform is the four-step all_to_all NTT.  Domains too small for
    the mesh factorization (< D^2) fall back to the replicated
    single-device transform — only reachable at toy sizes."""
    F = fr_field(backend)
    D = mesh.devices.size
    use_fs = _mesh_fits_fourstep(d, D)

    def intt(x):
        return (ntt_four_step(mesh, x, inverse=True) if use_fs
                else ntt_mod.ntt_mont(x, True, backend))

    def coset(x):
        if use_fs:
            return coset_ntt_fs(mesh, intt(x), backend)
        return ntt_mod.coset_ntt_mont(intt(x), backend)

    assert len(evs) == 3
    ca = coset(evs.pop(0))
    cb = coset(evs.pop(0))
    ab = F.mont_mul(ca, cb)
    del ca, cb
    cc = coset(evs.pop(0))
    z_on_coset = (pow(FR_GENERATOR, d, P) - 1) % P
    zinv = F.const_mont(pow(z_on_coset, -1, P))
    h_evals = F.mont_mul(F.sub(ab, cc), zinv[None])
    del ab, cc
    h_coeffs = (coset_intt_fs(mesh, h_evals, backend) if use_fs
                else ntt_mod.coset_intt_mont(h_evals, backend))
    del h_evals
    return F.from_mont(h_coeffs[: d - 1])


# ------------------------------------------------------ sharded prover


def create_proof_sharded(params, cs, mesh, r: Optional[int] = None,
                         s: Optional[int] = None, backend: str = "jax"):
    """Mesh-parallel `create_proof`: identical math and wire output to
    groth16.prove.create_proof, with the 5 MSMs on the sharded v3 drain
    and the h phase on the four-step all_to_all NTT.  Verifies under the
    same VK (the proof is bit-compatible — randomness r, s pins it)."""
    from ..crypto import bls12_381 as bls
    from ..groth16 import qap
    from ..groth16.keygen import g1_wire, g2_wire
    from ..groth16.r1cs import SynthesisError
    from ..groth16.sparse import DeviceR1CS
    from ..zk.proof import Groth16Proof

    pk = params.pk
    dev = params.dev_r1cs
    if dev is None or dev.c.n_constraints != cs.n_constraints:
        dev = DeviceR1CS(cs.compiled(), backend)
        params.dev_r1cs = dev
    n_inputs = dev.c.num_inputs
    num_vars = dev.c.num_vars
    if r is None:
        r = secrets.randbelow(bls.R)
    if s is None:
        s = secrets.randbelow(bls.R)

    F = fr_field(backend)
    z_ints = cs.full_assignment()
    if len(z_ints) != num_vars:
        raise SynthesisError("assignment/circuit shape mismatch")
    Np = pk.a_query[0].shape[0]
    z_np = np.zeros((Np, 16), np.uint32)
    from ..native import native_encode_fr16

    enc16 = native_encode_fr16(z_ints, P)
    if enc16 is not None:
        z_np[:num_vars] = enc16
    else:
        from ..fields.limbs import ints_to_array

        z_np[:num_vars] = ints_to_array([v % P for v in z_ints], 16)
    z_dev = F.xp.asarray(z_np)
    z_mont = F.to_mont(z_dev)

    d = qap.domain_size(dev.c.n_constraints, n_inputs)
    evs = [p.eval(z_mont, dev.pal_mont) for p in dev.row_plans]
    del z_mont
    for i in range(3):
        n = evs[i].shape[0]
        if n != d:
            evs[i] = F.xp.concatenate(
                [evs[i], F.xp.zeros((d - n, 16), evs[i].dtype)], axis=0
            )
    h_std = compute_h_sharded(mesh, evs, d, backend)
    del evs

    aux_np = np.zeros((Np, 16), np.uint32)
    aux_np[: num_vars - n_inputs] = z_np[n_inputs:num_vars]

    from ..groth16.prove import _msm_c

    c_full = _msm_c(Np)
    plan_z = pm.make_dedup_plan(z_np)
    plan_aux = plan_z.derive_shifted(n_inputs)

    h_pad = F.xp.concatenate(
        [h_std, F.xp.zeros((Np - h_std.shape[0], 16), h_std.dtype)], axis=0
    ) if h_std.shape[0] != Np else h_std

    def run(query, scalars, plan, kind):
        return msm_sharded_v3(mesh, query, scalars, kind=kind, c=c_full,
                              dedup_plan=plan)

    sum_az = run(pk.a_query, z_dev, plan_z, "g1")
    sum_bz_g1 = run(pk.b_g1_query, z_dev, plan_z, "g1")
    sum_h = run(pk.h_query, h_pad, None, "g1") if d > 1 else None
    sum_l = (run(pk.l_query, F.xp.asarray(aux_np), plan_aux, "g1")
             if num_vars > n_inputs else None)
    sum_bz_g2 = run(pk.b_g2_query, z_dev, plan_z, "g2")

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

"""Multi-chip sharding of the proving kernels (SURVEY.md §2.3).

The reference distributes proving as whole Groth16 jobs handed to workers
over HTTP (src/mpn/mod.rs work pool).  Within one job, this module maps
the two hot kernels onto a `jax.sharding.Mesh`:

  * `msm_sharded` — points/scalars sharded over the mesh's data axis;
    each chip runs the full Pippenger bucket pipeline on its shard
    (`ops.msm`), producing one partial point; partials are combined with
    a log-depth tree of complete adds (the curve-group analog of psum —
    point addition isn't elementwise, so the reduction is expressed as
    adds over the gathered partials and XLA lowers the data movement to
    ICI collectives).
  * `ntt_sharded` — the radix-2 stage loop jitted over a sharded input;
    XLA's SPMD partitioner inserts the per-stage butterfly exchanges
    (the all-to-all analog of sequence parallelism).  A hand-scheduled
    Bailey four-step NTT (one explicit all_to_all between local stage
    groups) is the planned optimization.
  * `eddsa_verify_sharded` — embarrassingly parallel signature checks.

Everything compiles and runs on an N-virtual-device CPU mesh for tests
(`--xla_force_host_platform_device_count`), and identically on real
pods.
"""

from __future__ import annotations

import functools

import numpy as np

from ..ops import msm as msm_mod
from ..ops import ntt as ntt_mod
from ..ops import weierstrass as wst


def make_mesh(n_devices: int | None = None, axis: str = "data"):
    """n-device 1-D mesh.  If the default platform has fewer devices
    than requested (e.g. the axon tunnel exposes ONE real TPU but the
    caller wants an 8-way virtual mesh), fall back to the CPU backend,
    whose device count is set by --xla_force_host_platform_device_count.
    Never silently builds a smaller mesh: sharded-code validation on a
    1-device mesh would vacuously pass while proving nothing."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        devs = jax.devices("cpu")
    if len(devs) < n:
        raise ValueError(
            f"need {n} devices, have {len(devs)} "
            "(set --xla_force_host_platform_device_count)"
        )
    return Mesh(np.array(devs[:n]), axis_names=(axis,))


# ---------------------------------------------------------------- MSM


def _pad_pow2(n: int, minimum: int = 16) -> int:
    p = minimum
    while p < n:
        p *= 2
    return p


@functools.cache
def _msm_sharded_fn(kind: str, backend: str, n_local: int, c: int, nbits: int,
                    n_dev: int, axis: str):
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    wst.warmup(backend)
    if kind == "g1":
        K, b3 = wst.fp_ops(backend), wst.g1_b3(backend)
    else:
        K, b3 = wst.fp2_ops(backend), wst.g2_b3(backend)
    local_msm = msm_mod._msm_fused_fn(K, b3, n_local, c, nbits)

    def partial(P_pts, scalars):
        # runs per-device on its shard; returns coords with a
        # leading length-1 axis so shard_map stacks partials
        out = local_msm(P_pts, scalars)
        return msm_mod._pmap(lambda x: x[None], out)

    def run(mesh, P_pts, scalars):
        spec_pt = msm_mod._pmap(lambda _: P(axis), P_pts)
        # check_rep=False: the Pippenger while_loop carries start from
        # replicated identity constants, which the varying-axes checker
        # would otherwise reject
        shard = shard_map(
            partial,
            mesh=mesh,
            in_specs=(tuple(spec_pt), P(axis)),
            out_specs=msm_mod._pmap(lambda _: P(axis), P_pts),
            check_rep=False,
        )
        partials = shard(P_pts, scalars)  # coords: (n_dev, ...)
        # tree-reduce the n_dev partials with complete adds
        m = n_dev
        while m > 1:
            half = m // 2
            lo = msm_mod._pmap(lambda x: x[:half], partials)
            hi = msm_mod._pmap(lambda x: x[half : 2 * half], partials)
            partials = wst.proj_add(K, lo, hi, b3)
            m = half
        return msm_mod._pmap(lambda x: x[0], partials)

    return run


def msm_sharded(mesh, P_pts, scalars, kind: str = "g1", c: int | None = None,
                nbits: int = 255, backend: str = "jax"):
    """Sharded MSM: P_pts projective limb tuple (N, ...), scalars (N, 16)
    standard-form; N must divide evenly over the mesh axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = scalars.shape[0]
    assert n % n_dev == 0, "pad N to a multiple of the mesh size"
    n_local = n // n_dev
    if c is None:
        c = msm_mod._choose_c(n_local)
    fn = _msm_sharded_fn(kind, backend, n_local, c, nbits, n_dev, axis)

    @functools.partial(jax.jit, static_argnums=())
    def jitted(P_pts, scalars):
        return fn(mesh, P_pts, scalars)

    return jitted(P_pts, scalars)


def msm_sharded_host(mesh, points, scalars, kind: str = "g1",
                     c: int | None = None, nbits: int = 255):
    """Host affine points + int scalars -> host affine point, sharded."""
    n_dev = mesh.devices.size
    n = _pad_pow2(len(points))
    while n % n_dev:
        n *= 2
    points = list(points) + [None] * (n - len(points))
    scalars = list(scalars) + [0] * (n - len(scalars))
    if kind == "g1":
        K = wst.fp_ops("jax")
        P_pts = wst.g1_to_proj(K, points)
    else:
        K = wst.fp2_ops("jax")
        P_pts = wst.g2_to_proj(K, points)
    s = msm_mod._enc_scalars(scalars, "jax")
    R = msm_sharded(mesh, P_pts, s, kind, c, nbits)
    if kind == "g1":
        R = tuple(np.asarray(x)[None] for x in R)
        return wst.g1_from_proj(wst.fp_ops("np"), R)[0]
    R = tuple(tuple(np.asarray(x)[None] for x in coord) for coord in R)
    return wst.g2_from_proj(wst.fp2_ops("np"), R)[0]


def msm_sharded_v2(mesh, points, scalars, c: int = 8, nbits: int = 255,
                   s_tile: int = 8):
    """G1 MSM on the v2 fused limb-major pipeline, data-parallel over the
    mesh: each device runs the whole-window bucket program on its point
    shard (ops.pallas_msm._msm_program — ONE while_loop, fused
    add+select kernel), producing per-device window sums; the cross-chip
    reduction is the per-window point sum + windowed combine on the host
    (n_dev x n_windows cheap host adds).  Host affine in/out."""
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..crypto import bls12_381 as bls
    from ..ops import pallas_msm as pm

    axis = mesh.axis_names[0]
    D = mesh.devices.size
    n = _pad_pow2(len(points))
    while n % D:
        n *= 2
    points = list(points) + [None] * (n - len(points))
    scalars = list(scalars) + [0] * (n - len(scalars))
    P_am, inf = pm.points_to_am(points)
    s = msm_mod._enc_scalars(scalars, "jax")
    run, n_windows = pm._msm_program(n // D, c, nbits, s_tile, False)

    def local(P_shard, inf_shard, s_shard):
        return run(P_shard, inf_shard, s_shard)[None]

    shard = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis), P(axis, None)),
        out_specs=P(axis, None, None, None),
        check_rep=False,
    )
    wins = np.asarray(jax.jit(shard)(P_am, inf, s))  # (D, 3, 24, W)
    K_np = wst.fp_ops("np")
    acc = None
    for w in range(n_windows - 1, -1, -1):
        for _ in range(c):
            acc = bls.g1_add(acc, acc)
        for d in range(D):
            pt = wst.g1_from_proj(
                K_np,
                (wins[d, 0, :, w][None].copy(), wins[d, 1, :, w][None].copy(),
                 wins[d, 2, :, w][None].copy()),
            )[0]
            acc = bls.g1_add(acc, pt)
    return acc


# ---------------------------------------------------------------- NTT


def ntt_sharded(mesh, x, inverse: bool = False):
    """NTT over a sharded (N, 16) Montgomery limb array.  The stage loop
    is jitted with the input sharded over the mesh; XLA SPMD inserts the
    butterfly exchange collectives.  (Baseline path — `ntt_four_step` is
    the hand-scheduled version with explicit all_to_all.)"""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    n = x.shape[0]
    log_n = n.bit_length() - 1
    fn = ntt_mod._ntt_fn(log_n, inverse, "jax")
    sharding = NamedSharding(mesh, P(axis, None))
    x = jax.device_put(x, sharding)
    jitted = jax.jit(fn, out_shardings=sharding)
    return jitted(x, ntt_mod._rev_dev(log_n, "jax"),
                  ntt_mod._stage_twiddles(log_n, inverse, "jax"))


@functools.cache
def _four_step_consts(log_n: int, inverse: bool, backend: str):
    """Host-precomputed (R, C, 16) Montgomery twiddle matrix
    T[k1, j2] = w^(j2*k1) for the middle step, plus 1/N for inverse."""
    from ..fields.limbs import fr_field

    F = fr_field(backend)
    n = 1 << log_n
    log_c = log_n // 2
    log_r = log_n - log_c
    R, C = 1 << log_r, 1 << log_c
    w = ntt_mod.root_of_unity(log_n)
    P_ = ntt_mod.P
    if inverse:
        w = pow(w, -1, P_)
    # T[k1] is the geometric row (w^k1)^j2 — built with O(N) host muls
    tw = np.empty((R, C), dtype=object)
    wk = 1
    for k1 in range(R):
        acc = 1
        row = tw[k1]
        for j2 in range(C):
            row[j2] = acc
            acc = acc * wk % P_
        wk = wk * w % P_
    tw_mont = F.xp.asarray(F.encode(tw))
    n_inv = F.const_mont(pow(n, -1, P_)) if inverse else None
    return tw_mont, n_inv


def ntt_four_step(mesh, x, inverse: bool = False, backend: str = "jax"):
    """Bailey four-step NTT with EXPLICIT all_to_all transposes
    (SURVEY.md §7 stage 5 / hard-part #4 — the sequence-parallel analog).

    N = R*C; view x (natural order) as an (R, C) row-major matrix sharded
    over rows.  Per device:
      1. all_to_all -> column-sharded (R, C/D): full columns local
      2. local length-R NTTs along axis 0 (batched butterfly stages)
      3. multiply by the (R, C) twiddle matrix w^(j2*k1) (sharded)
      4. all_to_all -> row-sharded (R/D, C), local length-C NTTs along
         axis 1, then a final all_to_all + local transpose to deliver
         natural-order output (X viewed as (C, R) row-major)
    All butterflies are local; exactly 3 collective transposes move each
    element once per exchange (vs per-stage exchanges in the naive
    sharding).  Bit-exact vs ops.ntt.ntt_host.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..fields.limbs import fr_field

    F = fr_field(backend)
    axis = mesh.axis_names[0]
    D = mesh.devices.size
    n = x.shape[0]
    log_n = n.bit_length() - 1
    log_c = log_n // 2
    log_r = log_n - log_c
    R, C = 1 << log_r, 1 << log_c
    assert R % D == 0 and C % D == 0, "mesh must divide both NTT factors"
    tw_mont, n_inv = _four_step_consts(log_n, inverse, backend)

    col_fn = ntt_mod._ntt_batched_fn(log_r, inverse, backend, scale=False)
    row_fn = ntt_mod._ntt_batched_fn(log_c, inverse, backend, scale=False)
    # local-factor tables are O(sqrt N) — small enough to close over
    # (they land as replicated program constants)
    col_args = (ntt_mod._rev_dev(log_r, backend),
                ntt_mod._stage_twiddles(log_r, inverse, backend))
    row_args = (ntt_mod._rev_dev(log_c, backend),
                ntt_mod._stage_twiddles(log_c, inverse, backend))

    def local(xb, twb):
        # xb: (R/D, C, 16) rows of the (R, C) matrix
        a = jax.lax.all_to_all(xb, axis, split_axis=1, concat_axis=0,
                               tiled=True)  # (R, C/D, 16)
        a = col_fn(a.transpose(1, 0, 2), *col_args)  # (C/D, R, 16): NTT over j1
        a = a.transpose(1, 0, 2)  # (R, C/D, 16) = A[k1, j2_local]
        a = F.mont_mul(a, twb)  # twb: (R, C/D, 16)
        a = jax.lax.all_to_all(a, axis, split_axis=0, concat_axis=1,
                               tiled=True)  # (R/D, C, 16)
        a = row_fn(a, *row_args)  # NTT over j2 -> Y[k1_local, k2]
        if n_inv is not None:
            a = F.mont_mul(a, n_inv[None, None])
        # natural order: X.reshape(C, R)[k2, k1] = Y[k1, k2]
        a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=0,
                               tiled=True)  # (R, C/D, 16) full-k1 columns
        return a.transpose(1, 0, 2)  # (C/D, R, 16) rows k2 local

    shard = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(None, axis, None)),
        out_specs=P(axis, None, None),
        check_rep=False,
    )
    xs = jax.device_put(
        x.reshape(R, C, F.n), NamedSharding(mesh, P(axis, None, None))
    )
    tws = jax.device_put(tw_mont, NamedSharding(mesh, P(None, axis, None)))
    out = jax.jit(shard)(xs, tws)
    return out.reshape(n, F.n)


# ---------------------------------------------------------------- EdDSA


def eddsa_verify_sharded(mesh, pks, msgs, sigs):
    """Batch-sharded witness-side signature verification (the rayon
    par_iter analog, reference: src/mpn/update.rs:31-38)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..fields.limbs import fr_field
    from ..ops.jubjub_batch import _verify_fn
    from ..crypto import jubjub as jj

    F = fr_field("jax")
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = len(pks)
    pad = (-n) % n_dev
    pk0, sk0 = jj.JubJub.generate_keys(b"pad")
    sig0 = jj.JubJub.sign(sk0, 0)
    pks = list(pks) + [pk0.decompress()] * pad
    msgs = list(msgs) + [0] * pad
    sigs = list(sigs) + [sig0] * pad

    enc = lambda vals: F.xp.asarray(F.encode(np.array(vals, dtype=object)))
    sharding = NamedSharding(mesh, P(axis, None))
    args = [
        enc([p[0] for p in pks]),
        enc([p[1] for p in pks]),
        enc(list(msgs)),
        enc([s.r[0] for s in sigs]),
        enc([s.r[1] for s in sigs]),
        F.xp.asarray(F.encode(np.array([s.s for s in sigs], dtype=object), mont=False)),
    ]
    args = [jax.device_put(a, sharding) for a in args]
    ok = np.asarray(_verify_fn("jax")(*args))[:n]
    curve_ok = np.array(
        [jj.is_on_curve(pk) and jj.is_on_curve(sig.r)
         for pk, sig in zip(pks[:n], sigs[:n])]
    )
    return ok & curve_ok


# ---------------------------------------------------- sharded prover
# (at the bottom: parallel.prove imports ntt_four_step from this module)

from .prove import (  # noqa: E402
    compute_h_sharded,
    coset_intt_fs,
    coset_ntt_fs,
    create_proof_sharded,
    msm_sharded_v3,
)

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
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = n_devices or len(devs)
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


# ---------------------------------------------------------------- NTT


def ntt_sharded(mesh, x, inverse: bool = False):
    """NTT over a sharded (N, 16) Montgomery limb array.  The stage loop
    is jitted with the input sharded over the mesh; XLA SPMD inserts the
    butterfly exchange collectives."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    n = x.shape[0]
    fn = ntt_mod._ntt_fn(n.bit_length() - 1, inverse, "jax")
    sharding = NamedSharding(mesh, P(axis, None))
    x = jax.device_put(x, sharding)
    jitted = jax.jit(fn, out_shardings=sharding)
    return jitted(x)


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

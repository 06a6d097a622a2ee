"""Groth16 prover: device-side witness reduction + TPU NTTs and MSMs.

Pipeline (bellman-equivalent math, TPU execution; SURVEY.md §3.2):
  1. a_j, b_j, c_j per extended constraint row — device sparse matvec
     over the COO matrices (groth16.sparse), no Python per-row loops
  2. h(x) = (a(x)·b(x) − c(x)) / Z(x) via 3 iNTT + 3 coset NTT + 1 coset
     iNTT on device — on the coset gH, Z ≡ g^d − 1 is a CONSTANT, so the
     division is one batched multiply
  3. A = α + Σ z_i u_i(τ) + rδ;  B = β + Σ z_i v_i(τ) + sδ;
     C = (Σ_aux z_i L_i + Σ h_i H_i) + sA + rB₁ − rsδ
     — 4 G1 MSMs on the fused limb-major pipeline (ops.pallas_msm) +
     1 G2 MSM (ops.msm)
"""

from __future__ import annotations

import secrets
from typing import Optional

import numpy as np

from ..crypto import bls12_381 as bls
from ..fields.host import FR_GENERATOR, FR_MODULUS
from ..fields.limbs import fr_field
from ..ops import ntt as ntt_mod
from ..ops import pallas_msm as pmsm
from ..zk.proof import Groth16Proof
from . import qap
from .keygen import Parameters, g1_wire, g2_wire
from .r1cs import ConstraintSystem, SynthesisError
from .sparse import DeviceR1CS

P = FR_MODULUS


# Above this domain size the prover runs in "big" mode: GB-scale stages
# are serialized and idle tensors parked at half width (see
# compute_h_mont).  Module-level so tests can exercise big mode at toy
# sizes.
BIG_DOMAIN = 1 << 23


def _msm_c(n: int) -> int:
    """Window size by MSM length: balances accumulation rounds (~n/2^c)
    against lane count (n_windows * 2^c)."""
    if n >= 1 << 18:
        return 12
    if n >= 1 << 12:
        return 8
    return 4


# ---------------------------------------------------------------------------
# Narrow-wire uploads.  Every limb array is a 16-bit payload stored in
# uint32 (W = 16 Montgomery limbs), so HALF the bytes shipped to the
# device are zeros.  The tunnel to the chip runs far below HBM
# bandwidth and mainnet-scale proofs move ~19 GB of query data per
# proof, so queries/scalars go over the wire as uint16 (uint8 for
# infinity flags) and are widened back to uint32 by a trivial
# HBM-bound cast on device.
def _widen_u32(x, donate: bool = True):
    """Device cast back to the kernels' uint32 limb layout.

    donate=True frees the narrow buffer as soon as the cast runs — only
    safe for per-proof uploads.  Device-RESIDENT narrow queries (keygen
    keeps them across proofs) must widen with donate=False."""
    import jax
    import jax.numpy as jnp

    if x.dtype == jnp.uint32:
        return x
    if donate:
        return jax.jit(lambda a: a.astype(jnp.uint32), donate_argnums=0)(x)
    return jax.jit(lambda a: a.astype(jnp.uint32))(x)


def _narrow_np(a: np.ndarray) -> np.ndarray:
    """Host-side narrowing: limb payloads fit uint16, flags fit uint8.
    v2 directory keys are already narrow on disk — their memmaps pass
    straight to the upload with no host copy."""
    if a.dtype in (np.uint16, np.uint8):
        return a
    if a.ndim == 1:  # infinity flags (0/1)
        return np.asarray(a, dtype=np.uint8)
    return np.asarray(a, dtype=np.uint16)


def _device_put_narrow(a: np.ndarray):
    """Async upload at half width; pair with _widen_u32 at consume time."""
    import jax

    return jax.device_put(_narrow_np(a))


def compute_h_mont(evs: list, d: int, backend: str = "jax"):
    """[ea, eb, ec] (d, 16) Montgomery row-evals -> h(x) coefficients
    (length d-1) as STANDARD-form limbs, on device (ready for the MSM
    digit extraction).

    Takes the polys as a LIST and pops each before transforming so its
    HBM is reclaimed as soon as its coset evaluation exists — at
    d = 2^24 each (d, 16) tensor is 1 GiB and keeping all of
    ea/eb/ec/ca/cb/cc live OOM'd the 16 GB chip (round 4)."""
    F = fr_field(backend)

    # At d >= 2^23 every transform's working set (stage buffers + the
    # per-call device-built tables) is GBs; async dispatch lets
    # consecutive transforms' transients coexist and overflow HBM
    # (round-4 b256 OOMs).  Two defenses in "big" mode:
    #   * serialize — wait for each transform before the next dispatch;
    #   * idle tensors wait at HALF width (uint16 limb payloads) so the
    #     active transform gets the chip mostly to itself.
    big = backend == "jax" and d >= BIG_DOMAIN
    _h_timing = bool(__import__("os").environ.get("BAZUKA_PROVE_TIMING"))
    _ht = [__import__("time").perf_counter()]

    def _htick(name):
        if _h_timing and big:
            import time as _tm

            now = _tm.perf_counter()
            print(f"    [h] {name}: {now - _ht[0]:.2f}s", flush=True)
            _ht[0] = now

    def _sync(x):
        if big:
            import jax

            jax.block_until_ready(x)
        return x

    def park(x):
        """uint32 -> uint16 'parked' copy (values are 16-bit payloads)."""
        if not big:
            return x
        import jax
        import jax.numpy as jnp

        return _sync(jax.jit(
            lambda a: a.astype(jnp.uint16), donate_argnums=0)(x))

    def unpark(x):
        if not big:
            return x
        return _sync(_widen_u32(x))

    # interpolate then re-evaluate on the coset gH, one poly at a time
    def coset(x):
        i = _sync(ntt_mod.ntt_mont(x, True, backend))
        _htick("intt")
        out = _sync(ntt_mod.coset_ntt_mont(i, backend))
        _htick("coset-ntt")
        return out

    assert len(evs) == 3
    if big:  # park the two waiting inputs
        evs[1] = park(evs[1])
        evs[2] = park(evs[2])
    _htick("park-inputs")
    ca = park(coset(evs.pop(0)))
    cb = coset(unpark(evs.pop(0)))
    ab = _sync(F.mont_mul(unpark(ca), cb))
    del ca, cb
    ab = park(ab)
    _htick("a*b")
    cc = coset(unpark(evs.pop(0)))
    z_on_coset = (pow(FR_GENERATOR, d, P) - 1) % P
    zinv = F.const_mont(pow(z_on_coset, -1, P))
    h_evals = _sync(F.mont_mul(F.sub(unpark(ab), cc), zinv[None]))
    del ab, cc
    _htick("(ab-c)/Z")
    h_coeffs = ntt_mod.coset_intt_mont(h_evals, backend)
    del h_evals
    _htick("coset-intt")
    # degree ≤ d-2: drop the top coefficient, return standard form for MSM
    return F.from_mont(h_coeffs[: d - 1])


def _pad_rows(F, x, d: int):
    n = x.shape[0]
    if n == d:
        return x
    return F.xp.concatenate(
        [x, F.xp.zeros((d - n, x.shape[1]), x.dtype)], axis=0
    )


def _g2_msm(query, scalars_std, backend: str, plan=None, c: int = 12,
            chunk: int = 1 << 18):
    """query: ((Np, 4, 24) affine, (Np,) inf) — the v2 G2 pipeline."""
    return pmsm.msm_lm_g2(query[0], query[1], scalars_std, c=c,
                          dedup_plan=plan, chunk=chunk)


def _g2_msm_big(query_narrow, scalars_std, plan, c: int, chunk: int,
                fresh: bool):
    """Big-mode G2 MSM over the NARROW query: the full 6.4 GB widened
    (2^24, 4, 24) tensor never exists.  The heavy-group presum reads
    the narrow query directly (its per-round gather widens for free);
    the main drain runs as TWO half-length MSMs, widening one 3.2 GB
    half at a time, combined by a host G2 add.  Peak HBM ≈ narrow full
    (3.2) + wide half (3.2) + scalars (1.6) + drain scratch (≈3.9 at
    chunk 2^17) ≈ 12 GB — vs ≥16 GB for the monolithic drain, the
    round-5 v11/v12 OOM and v13 device-fault site.  The halves also
    compile a half-length program (shared between the two calls)."""
    import jax
    import jax.numpy as jnp

    am_n, inf_n = query_narrow
    inf = _widen_u32(inf_n, donate=fresh)
    extra = None
    if plan is not None and plan.active:
        sum_am, sum_inf = pmsm.presum_g2_am(am_n, inf, plan)
        V = int(plan.heavy_scalars.shape[0])
        extra = pmsm.msm_lm_g2(sum_am, sum_inf,
                               jnp.asarray(plan.heavy_scalars),
                               c=4 if V < (1 << 12) else 8, chunk=chunk)
        del sum_am, sum_inf
        scalars_std = pmsm._zero_rows_fn()(scalars_std,
                                           jnp.asarray(plan.hpos))
    N = int(am_n.shape[0])
    half = N // 2
    widen_half = jax.jit(
        lambda a, lo: jax.lax.dynamic_slice(
            a, (lo, 0, 0), (half, a.shape[1], a.shape[2])
        ).astype(jnp.uint32)
    )
    total = extra
    for lo in (0, half):
        wide = widen_half(am_n, jnp.int32(lo))
        part = pmsm.msm_lm_g2(wide, inf[lo:lo + half],
                              scalars_std[lo:lo + half], c=c, chunk=chunk)
        del wide
        if part is not None:
            total = bls.g2_add(total, part) if total is not None else part
    return total


def create_proof(
    params: Parameters,
    cs: ConstraintSystem,
    r: Optional[int] = None,
    s: Optional[int] = None,
    backend: str = "jax",
) -> Groth16Proof:
    import os
    import time as _time

    _timing = bool(os.environ.get("BAZUKA_PROVE_TIMING"))
    _t = [_time.perf_counter()]

    def _tick(name):
        if _timing:
            import jax

            now = _time.perf_counter()
            mem = ""
            try:
                # memory_stats() returns zeros on this stack (round-4
                # note), so the HBM column is a CLIENT-side ledger: the
                # bytes of every live jax.Array in the process.  It
                # misses program scratch (the drain's stream/trace) but
                # pinpoints which stage's RESIDENT set grew — the
                # round-4 OOM hunt took ten blind runs for lack of
                # exactly this.
                arrs = [a for a in jax.live_arrays() if not a.is_deleted()]
                live = sum(a.nbytes for a in arrs)
                mem = f"  [live {live / 2**30:.2f} GiB / {len(arrs)} arrays]"
            except Exception:
                pass
            print(f"  [prove] {name}: {now - _t[0]:.2f}s{mem}", flush=True)
            _t[0] = now

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
    _tick("witness encode: assignment")
    # pad to the shared MSM query length BEFORE any device op so every
    # per-proof kernel (to_mont, digit extraction) compiles at one shape
    Np = pk.a_query[0].shape[0]
    d = qap.domain_size(dev.c.n_constraints, n_inputs)
    big = backend == "jax" and d >= BIG_DOMAIN

    # NOTE on compile warm-up (round-5 finding): AOT-compiling the MSM
    # programs on a worker thread via lower().compile() does NOT reach
    # the later jit call sites on this stack — v13 prewarmed both 2^24
    # drains (552 s) and every presum program (1497 s) and MSM a STILL
    # paid its full ~590 s first-dispatch compile.  Cold-proof compile
    # cost is therefore structural per process; production provers are
    # long-lived and amortize it (the tool's --warm-proves measures the
    # steady state).  Only the cheap host-side plan work overlaps below.
    g2_chunk = (1 << 17) if big else (1 << 18)  # G2 drain HBM plan
    z_np = np.zeros((Np, 16), np.uint32)
    # HOST-side limb encode.  F.encode on the jax backend ends in
    # xp.asarray — a device upload — and assigning that into z_np would
    # download it right back: a ~1.7 GB hidden tunnel round-trip at
    # Np = 2^24 (round 4: 164 s of the witness-encode wall was exactly
    # this).  The encode itself is native C (one pass over the list,
    # ~5x the bytes path at 13M vars); fallback: ints_to_array.
    from ..native import native_encode_fr16

    enc16 = native_encode_fr16(z_ints, P)
    if enc16 is not None:
        z_np[:num_vars] = enc16
    else:
        from ..fields.limbs import ints_to_array

        z_np[:num_vars] = ints_to_array([v % P for v in z_ints], 16)
    _tick("witness encode: limb encode")
    # Only the NARROW z (0.54 GB at Np = 2^24) stays on device through
    # the h phase — the phase peaks HBM (three 1 GiB polys + NTT
    # transients + per-call tables) and the widened z/aux are not
    # needed until the MSM loop.
    if backend == "jax":
        z_n16 = _device_put_narrow(z_np)
        z_mont = F.to_mont(_widen_u32(z_n16, donate=False))
    else:
        z_n16 = None
        z_mont = F.to_mont(F.xp.asarray(z_np))
    if _timing:
        import jax

        jax.block_until_ready(z_mont)
    _tick("witness encode: upload + to_mont")

    # Dedup plans are pure host work over z_np (C++ group sort +
    # run-decomposition) — overlap them with the device-bound h phase
    # on a second thread instead of paying ~17 s serially afterwards.
    plan_box: dict = {}
    plan_thread = None
    if backend == "jax":
        import threading

        def _plan_worker():
            try:
                plan_box["z"] = pmsm.make_dedup_plan(z_np)
                plan_box["aux"] = plan_box["z"].derive_shifted(n_inputs)
            except Exception:
                plan_box.clear()  # fall back to the serial path below

        plan_thread = threading.Thread(target=_plan_worker, daemon=True)
        plan_thread.start()

    def _sync(x):
        if big:  # serialize GB-scale stages (see compute_h_mont)
            import jax

            jax.block_until_ready(x)
        return x

    # one sparse matvec at a time: each gathers/multiplies (n_terms, 16)
    # transients that must not coexist at mainnet scale
    evs = [_sync(p.eval(z_mont, dev.pal_mont)) for p in dev.row_plans]
    del z_mont  # only eval_rows consumes the Montgomery witness
    for i in range(3):  # pad in place so each unpadded poly frees now
        evs[i] = _sync(_pad_rows(F, evs[i], d))
    h_std = compute_h_mont(evs, d, backend)
    del evs
    if _timing:
        import jax

        jax.block_until_ready(h_std)
    _tick("eval_rows + h(x) NTTs")

    # z/aux MSM scalars, widened now that the h phase's HBM peak is
    # over.  aux = z shifted down by the public inputs with a zero
    # tail — a device slice+pad, not a second upload.
    if backend == "jax":
        import jax
        import jax.numpy as jnp

        z_p = _widen_u32(z_n16, donate=True)
        del z_n16
        aux_p = jax.jit(
            lambda z: jnp.pad(z[n_inputs:num_vars],
                              ((0, Np - (num_vars - n_inputs)), (0, 0)))
        )(z_p)
    else:
        z_p = F.xp.asarray(z_np)
        aux_np = np.zeros((Np, 16), np.uint32)
        aux_np[: num_vars - n_inputs] = z_np[n_inputs:num_vars]
        aux_p = F.xp.asarray(aux_np)

    # every G1 query is keygen-padded to the same length Np, so the four
    # MSMs share ONE compiled device program (scalars zero-padded).
    # Witness scalars (z, aux) carry huge duplicate groups — hundreds of
    # thousands of boolean wires — which would blow the bucket drain's
    # round count; the dedup plans pre-reduce them (pallas_msm.presum).
    # h scalars are NTT outputs (statistically unique) — no plan.
    #
    # Mainnet-scale keys (Np = 2^24 at batch=256) keep their query
    # tensors HOST-side (~19 GB would not fit HBM all at once); each
    # MSM uploads its query and releases it before the next.  Uploads
    # ride the tunnel at far below HBM bandwidth, so the NEXT query's
    # transfer is issued asynchronously (jax.device_put) BEFORE the
    # current MSM runs — the copy overlaps the drain.  The G2 MSM goes
    # last: its query is 2x a G1 query, so it never coexists with more
    # than one pending G1 upload.
    c_full = _msm_c(Np)
    if plan_thread is not None:
        plan_thread.join()
    if "z" in plan_box:
        plan_z, plan_aux = plan_box["z"], plan_box["aux"]
    else:
        plan_z = pmsm.make_dedup_plan(z_np)
        plan_aux = plan_z.derive_shifted(n_inputs)
    _tick("dedup plans")

    def run_g1(query, scalars, plan):
        return pmsm.msm_lm(*query, scalars, c=c_full, dedup_plan=plan)

    def run_g2(query, scalars, plan, fresh=True):
        if big:
            # big mode: narrow-query half-split drain (see _g2_msm_big)
            return _g2_msm_big(query, scalars, plan, c_full, g2_chunk,
                               fresh)
        return _g2_msm(query, backend=backend, scalars_std=scalars,
                       plan=plan, c=c_full, chunk=g2_chunk)

    # Scalars travel in ONE-SHOT boxes: the loop pops the tensor out of
    # the box at call time, so during an MSM the only live reference is
    # the callee's argument (and the dedup branch drops even that once
    # it has built the zeroed copy) — without this, the caller frame
    # pinned 1 GiB z/aux/h tensors through every drain (v12 G2 OOM
    # component).  z rides in three boxes (a, b_g1, b_g2): the earlier
    # pops just drop box refs; the final pop leaves the callee alone.
    jobs = [
        ("a", pk.a_query, run_g1, [z_p], plan_z),
        ("b_g1", pk.b_g1_query, run_g1, [z_p], plan_z),
    ]
    if d > 1:
        jobs.append(("h", pk.h_query, run_g1, [_pad_rows(F, h_std, Np)],
                     None))
        del h_std  # the padded copy is 1 GiB at d = 2^24; keep ONE
    if num_vars > n_inputs:
        jobs.append(("l", pk.l_query, run_g1, [aux_p], plan_aux))
        del aux_p  # ref lives in the l job only; freed right after it runs
    jobs.append(("b_g2", pk.b_g2_query, run_g2, [z_p], plan_z))
    del z_p  # boxes hold the only refs; each pops as its MSM runs

    # Prefetch cap: a pending narrow G2 query at Np = 2^24 is 3.2 GB;
    # letting it coexist with the current widened G1 query + drain
    # scratch is fine on a 16 GB chip, but cap anyway so toy-HBM parts
    # and future query growth stay safe.
    PREFETCH_MAX_BYTES = 3.5 * (1 << 30)

    def _put(query, ahead: bool):
        if isinstance(query[0], np.ndarray):
            wire = query[0].nbytes  # uint32 halves on the wire; v2 keys
            if query[0].dtype == np.uint32:  # are already narrow on disk
                wire //= 2
            if ahead and wire > PREFETCH_MAX_BYTES:
                return None  # uploaded synchronously when its turn comes
            return tuple(_device_put_narrow(a) for a in query)
        return query

    def _consume(q, fresh: bool):
        """Widen a narrow query for the kernels.  Fresh per-proof uploads
        donate (free) their narrow buffer; device-RESIDENT narrow queries
        (keygen keeps them across proofs) widen into a transient copy."""
        return tuple(_widen_u32(a, donate=fresh) for a in q)

    sums = {"h": None, "l": None}
    pending = _put(jobs[0][1], ahead=False)
    for i in range(len(jobs)):
        name, query, run, sbox, plan = jobs[i]
        jobs[i] = None  # drop this job's box once it has run
        fresh = isinstance(query[0], np.ndarray)
        q, pending = pending, None
        if q is None:  # prefetch was skipped (size cap)
            q = _put(query, ahead=False)
        if i + 1 < len(jobs) and not big:
            # overlap the next query's tunnel upload with this MSM's
            # drain.  NOT in big mode — measured BOTH ways at 2^24
            # (round 5): the tunnel is one stream, so a pending 1.6 GB
            # narrow upload serializes AGAINST the current drain's
            # dispatch/sync traffic and every G1 stage slowed 30-70 s
            # (v15 warm 714.6 s vs v14's strictly-serialized 611.6 s,
            # even though the G2 stage itself sped up 207 -> 115 s).
            # Memory now has headroom for it (one-shot boxes, fused
            # masking, half-split G2) — latency is why it stays off.
            pending = _put(jobs[i + 1][1], ahead=True)
        if name == "b_g2" and big:
            # narrow tuple passes through: _g2_msm_big widens per half
            sums[name] = run(q, sbox.pop(), plan, fresh)
        else:
            sums[name] = run(_consume(q, fresh), sbox.pop(), plan)
        del q, query, sbox
        _tick(f"MSM {name}")
    sum_az, sum_bz_g1 = sums["a"], sums["b_g1"]
    sum_h, sum_l, sum_bz_g2 = sums["h"], sums["l"], sums["b_g2"]

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

#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON headline line (re-printed, upgraded,
as better metrics land — every printed line is complete and valid).

Headline: G1 MSM points/s at 2^20 with full-width scalars on the v3
balanced-drain limb-major Pippenger pipeline (ops.pallas_msm) — the
dominant Groth16 proving kernel (BASELINE.md config 4).  `extra`
carries the other measured sizes (2^18/2^22/2^24 MSM, 2^20/2^22 NTT)
so every BASELINE target size is visible in one line.  vs_baseline is measured against the working
CPU baseline of bellman-Pippenger ~= 0.5M points/s on a 32-core host
(BASELINE.md: the reference publishes no numbers of its own).

Architecture (round 3, after two rounds of rc=124 artifacts): a
two-process design, because a wedged TPU tunnel blocks backend init
inside an uninterruptible C call — in-process SIGALRM handlers never
run (round-2 failure mode).

  * The ORCHESTRATOR (this process, default role) never initializes a
    JAX backend.  It probes the relay socket, spawns ONE worker child
    per backend, tails the child's result file, and prints an upgraded
    headline JSON line the moment each stage lands.  Deadlines are
    enforced by killing the exact child process group — no
    pattern-matching, no reliance on the child being interruptible.
  * The WORKER (`--worker tpu|cpu`) owns the single TPU claim, runs
    stages cheapest-first, and appends one JSON object per completed
    stage to the result file (durable even if it is killed later).

Guaranteed output: if every JAX path fails, the orchestrator measures
the native C++ Poseidon engine (ctypes, no JAX) and prints that.
"""
import json
import os
import signal
import socket
import subprocess
import sys
import time

RESULT_FILE = "/tmp/bazuka_bench_stages.jsonl"
BASELINE_MSM = 500_000.0   # points/s, bellman on a 32-core CPU (estimate)
BASELINE_POSEIDON = 25_000.0  # hashes/s, reference poseidon on one core

# ------------------------------------------------------------ worker stages


def _append_stage(obj):
    with open(os.environ["BAZUKA_BENCH_OUT"], "a") as f:
        f.write(json.dumps(obj) + "\n")
        f.flush()
        os.fsync(f.fileno())


def _msm_inputs_np(log_n: int):
    """Host inputs without the per-element Python bigint path: 64
    distinct points encoded once then np-tiled to n rows; scalars as
    random 253-bit (< r) limb rows drawn directly as uint16 payloads.
    Input build at 2^24 drops from minutes of host bigint work to ~1 s,
    which is what lets the BASELINE sizes fit the driver budget."""
    import numpy as np

    from bazuka_tpu.crypto import bls12_381 as bls
    from bazuka_tpu.ops import pallas_msm as pm

    n = 1 << log_n
    base_pts = [bls.g1_mul(bls.G1_GEN, int(k)) for k in range(1, 65)]
    base_am, _ = pm.points_to_am(base_pts, backend="np")
    am_np = np.tile(np.asarray(base_am, np.uint32), (n // 64, 1, 1))
    inf_np = np.zeros(n, np.uint32)
    rng = np.random.default_rng(0)
    s_np = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    s_np[:, 15] &= 0x1FFF  # top limb 13 bits -> value < 2^253 < r
    return am_np, inf_np, s_np


def bench_msm(log_n: int, c: int = 12, iters: int = 3):
    """Warm points/s of the full MSM (device program + host combine),
    query device-resident (narrow upload + on-device widen, the
    prover's wire discipline)."""
    import jax
    import numpy as np

    from bazuka_tpu.ops import pallas_msm as pm
    from bazuka_tpu.ops import weierstrass as wst

    wst.warmup("jax")
    import jax.numpy as jnp

    n = 1 << log_n
    am_np, inf_np, s_np = _msm_inputs_np(log_n)
    widen = jax.jit(lambda a: a.astype(jnp.uint32), donate_argnums=0)
    P_am = widen(jax.device_put(np.asarray(am_np, np.uint16)))
    del am_np
    inf = jax.device_put(inf_np)
    s = widen(jax.device_put(np.asarray(s_np, np.uint16)))
    del s_np
    pm.msm_lm(P_am, inf, s, c=c)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pm.msm_lm(P_am, inf, s, c=c)
    dt = (time.perf_counter() - t0) / iters
    assert out is not None
    return n / dt


def bench_ntt(log_n: int, iters: int = 10):
    """Warm elements/s of the single-chip radix-2 NTT (BASELINE config 3)."""
    import numpy as np

    from bazuka_tpu.fields.limbs import fr_field
    from bazuka_tpu.ops.ntt import ntt_mont

    F = fr_field("jax")
    n = 1 << log_n
    rng = np.random.default_rng(1)
    limbs = rng.integers(0, 2**16, size=(n, 16), dtype=np.uint32)
    x = F.xp.asarray(limbs)
    out = ntt_mont(x)  # compile
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ntt_mont(out)  # chain the dependency: forces execution
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return n / dt


def bench_poseidon(batch=8192, iters=10):
    import jax
    import numpy as np

    from bazuka_tpu.fields.limbs import fr_field
    from bazuka_tpu.ops.poseidon import poseidon_batch_mont

    F = fr_field("jax")
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**63, size=(batch, 4), dtype=np.uint64)
    enc = F.xp.asarray(F.encode(np.array(vals, dtype=object)))
    out = poseidon_batch_mont(enc)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = poseidon_batch_mont(enc)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def run_worker(mode: str) -> int:
    """Run stages cheapest-first; append each result as it lands."""
    from bazuka_tpu.utils.jaxcfg import enable_compile_cache

    enable_compile_cache(tag=None if mode == "tpu" else "bench")
    import jax

    jax.devices()  # backend init: the orchestrator's deadline covers this
    _append_stage({"stage": "ready", "backend": jax.default_backend()})

    if mode == "tpu":
        # BASELINE.md sizes (config 3/4): MSM 2^18..2^24, NTT 2^20/2^22.
        # Cheapest-first so the headline lands early; each stage appends
        # durably, so a deadline kill keeps everything already measured.
        stages = [
            ("msm", 18), ("msm", 20), ("ntt", 20), ("msm", 22),
            ("ntt", 22), ("msm", 24),
        ]
    else:
        stages = [("poseidon", 13), ("ntt", 14)]
    for kind, log_n in stages:
        try:
            if kind == "msm":
                rate = bench_msm(log_n, iters=1 if log_n >= 24 else 3)
                _append_stage({"stage": f"msm{log_n}", "points_per_s": rate})
            elif kind == "ntt":
                rate = bench_ntt(log_n)
                _append_stage({"stage": f"ntt{log_n}", "elems_per_s": rate})
            else:
                rate = bench_poseidon(batch=1 << log_n)
                _append_stage({"stage": "poseidon", "hashes_per_s": rate})
        except Exception as e:  # noqa: BLE001 — report, keep going
            _append_stage({"stage_failed": f"{kind}{log_n}",
                           "error": f"{type(e).__name__}: {e}"})
    return 0


# ------------------------------------------------------- orchestrator


def _relay_up() -> bool:
    """Is the axon relay listening?  (It dies when its stdio transport
    closes; a dead relay means TPU backend init blocks forever.)"""
    try:
        socket.create_connection(("127.0.0.1", 8082), timeout=5).close()
        return True
    except OSError:
        return False


def _native_poseidon_fallback():
    """Last-resort metric with zero JAX involvement."""
    from bazuka_tpu.zk.poseidon_host import poseidon4

    t0 = time.perf_counter()
    n = 2000
    for i in range(n):
        poseidon4(i, i + 1, i + 2, i + 3)
    dt = time.perf_counter() - t0
    rate = n / dt
    return {
        "metric": "poseidon_t5_hashes_per_s_host",
        "value": round(rate, 1),
        "unit": "hashes/s",
        "vs_baseline": round(rate / BASELINE_POSEIDON, 3),
    }


def _compose(stages: dict):
    """Best headline + extras from the stage results seen so far."""
    extra = {}
    result = None
    for log_n in (20, 22, 24, 18):  # headline preference
        k = f"msm{log_n}"
        if k in stages and result is None:
            rate = stages[k]["points_per_s"]
            result = {
                "metric": f"msm_g1_points_per_s_2e{log_n}",
                "value": round(rate, 1),
                "unit": "points/s",
                "vs_baseline": round(rate / BASELINE_MSM, 3),
            }
        elif k in stages:
            extra[f"msm_g1_points_per_s_2e{log_n}"] = round(
                stages[k]["points_per_s"], 1)
    for k, v in stages.items():
        if k.startswith("ntt"):
            extra[f"ntt_elems_per_s_2e{k[3:]}"] = round(v["elems_per_s"], 1)
    if result is None and "poseidon" in stages:
        rate = stages["poseidon"]["hashes_per_s"]
        result = {
            "metric": "poseidon_t5_hashes_per_s",
            "value": round(rate, 1),
            "unit": "hashes/s",
            "vs_baseline": round(rate / BASELINE_POSEIDON, 3),
        }
    if result is not None and extra:
        result["extra"] = extra
    return result


def _drain(path: str, stages: dict) -> bool:
    """Fold any new stage lines into `stages`; True if something new."""
    new = False
    try:
        with open(path) as f:
            for line in f:
                try:
                    obj = json.loads(line)
                except ValueError:
                    continue
                key = obj.get("stage")
                if key and key not in stages:
                    stages[key] = obj
                    new = True
    except OSError:
        pass
    return new


def _run_child(mode: str, out_path: str, stages: dict,
               first_line_s: float, total_s: float) -> None:
    """Spawn a worker, stream its stage results, print upgraded headline
    lines as they land, kill it (exact pgid) on deadline."""
    env = dict(os.environ)
    env["BAZUKA_BENCH_OUT"] = out_path
    if mode == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", mode],
        env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    t0 = time.perf_counter()
    printed = None
    while True:
        if _drain(out_path, stages):
            result = _compose(stages)
            if result is not None and result != printed:
                print(json.dumps(result), flush=True)
                printed = result
        if child.poll() is not None:
            break
        elapsed = time.perf_counter() - t0
        # no first result => init wedge or cold-compile spiral: kill
        have_metric = any(not k.startswith("ready") for k in stages)
        if (not have_metric and elapsed > first_line_s) or elapsed > total_s:
            try:
                os.killpg(child.pid, signal.SIGKILL)
            except OSError:
                pass
            break
        time.sleep(2)
    _drain(out_path, stages)


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        return run_worker(sys.argv[2])

    out_path = os.environ.get("BAZUKA_BENCH_OUT", RESULT_FILE)
    try:
        os.unlink(out_path)
    except OSError:
        pass
    os.environ["BAZUKA_BENCH_OUT"] = out_path

    stages: dict = {}
    budget = float(os.environ.get("BAZUKA_BENCH_BUDGET", 1200))
    t0 = time.perf_counter()
    if _relay_up():
        _run_child("tpu", out_path, stages,
                   first_line_s=420, total_s=min(budget - 120, 1800))
    else:
        print("relay not listening: TPU unavailable, CPU fallback",
              file=sys.stderr)
    if not any(k.startswith(("msm", "ntt", "poseidon")) for k in stages):
        remaining = budget - (time.perf_counter() - t0) - 30
        _run_child("cpu", out_path, stages,
                   first_line_s=min(540, remaining),
                   total_s=max(60, remaining))
    result = _compose(stages)
    if result is None:
        result = _native_poseidon_fallback()
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Extract Poseidon parameters from the reference's hadeshash-generated data
files into a compact .npz consumed by bazuka_tpu.

The values themselves are protocol constants (round constants + MDS matrices
for Poseidon alpha=5, M=128, t=2..17 over BLS12-381 Fr) and must match the
reference bit-exactly (reference: src/zk/poseidon/params/mod.rs:39-57 parses
the same files).  We store them as 16-bit-limb uint32 arrays, the native
layout of our field engine.

Run:  python tools/extract_poseidon_params.py
"""

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bazuka_tpu.fields.limbs import ints_to_array  # noqa: E402

REF_DIR = "/root/reference/src/zk/poseidon/params"
OUT = os.path.join(
    os.path.dirname(__file__), "..", "bazuka_tpu", "zk", "data", "poseidon_params.npz"
)


def read_constants(line: str):
    s = line.replace("0x", "")
    s = re.sub(r"['\[\] ]", "", s)
    return [int(tok, 16) for tok in s.split(",") if tok]


def parse(path: str):
    with open(path) as f:
        lines = f.read().splitlines()
    opts = [s.strip() for s in lines[0].split(",")]
    t = int(opts[1].split("=")[1])
    full_rounds = int(opts[4].split("=")[1])
    partial_rounds = int(opts[5].split("=")[1])
    rc = read_constants(lines[3])
    mds_flat = read_constants(lines[15])
    assert len(rc) == t * (full_rounds + partial_rounds), (path, len(rc))
    assert len(mds_flat) == t * t
    return t, full_rounds, partial_rounds, rc, mds_flat


def main():
    out = {}
    for t in range(2, 18):
        path = os.path.join(REF_DIR, f"poseidon_params_n255_t{t}_alpha5_M128.txt")
        tt, rf, rp, rc, mds = parse(path)
        assert tt == t
        out[f"t{t}_rf"] = np.array(rf, dtype=np.int32)
        out[f"t{t}_rp"] = np.array(rp, dtype=np.int32)
        # round constants laid out (n_rounds, t, limbs)
        out[f"t{t}_rc"] = ints_to_array(rc, 16).reshape(rf + rp, t, 16)
        out[f"t{t}_mds"] = ints_to_array(mds, 16).reshape(t, t, 16)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: widths t=2..17")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Extract the hardcoded mainnet MPN ceremony VKs from the reference.

The reference embeds its three Groth16 verifying keys (produced by the
Ziesha trusted-setup ceremony) as bincode hex blobs at
/root/reference/src/config/blockchain.rs:31-38.  Like the Poseidon
parameter files, these are PROTOCOL CONSTANTS — any compatible node
must carry bit-identical keys.  This tool pulls the hex out of the Rust
source, decodes it with our reference-format wire codec
(bazuka_tpu.zk.wire), validates every point (on-curve + subgroup), and
writes the raw bincode bytes to bazuka_tpu/zk/data/mpn_<name>_vk.bin.

Run: python tools/extract_mpn_vks.py [path-to-blockchain.rs]
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bazuka_tpu.zk.wire import decode_vk, encode_vk, validate_vk_points

REF = Path(sys.argv[1] if len(sys.argv) > 1 else
           "/root/reference/src/config/blockchain.rs")
OUT = Path(__file__).resolve().parent.parent / "bazuka_tpu" / "zk" / "data"


def main():
    src = REF.read_text()
    pat = re.compile(
        r"MPN_(UPDATE|DEPOSIT|WITHDRAW)_VK[^=]*=\s*\n?\s*bincode::deserialize\("
        r"&hex::decode\(\"([0-9a-fA-F]+)\"\)",
        re.S,
    )
    found = dict((m.group(1).lower(), m.group(2)) for m in pat.finditer(src))
    assert set(found) == {"update", "deposit", "withdraw"}, sorted(found)
    for name, hexblob in sorted(found.items()):
        raw = bytes.fromhex(hexblob)
        vk = decode_vk(raw)
        err = validate_vk_points(vk)
        assert err is None, f"{name}: {err}"
        assert len(vk.ic) == 6, f"{name}: ic={len(vk.ic)} (want 5 inputs + 1)"
        assert encode_vk(vk) == raw, f"{name}: roundtrip mismatch"
        out = OUT / f"mpn_{name}_vk.bin"
        out.write_bytes(raw)
        print(f"{name}: {len(raw)} bytes, ic={len(vk.ic)}, all points valid -> {out}")


if __name__ == "__main__":
    main()

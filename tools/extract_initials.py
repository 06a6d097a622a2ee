#!/usr/bin/env python
"""Extract the mainnet genesis initial balances from the reference.

/root/reference/src/config/initials.rs is 13.9k lines of pure protocol
data: the L1 `initial_balances()` (ed25519 address -> amount) and the L2
`initial_mpn_balances()` (jubjub MPN address -> amount) that every
compatible node must reproduce bit-for-bit in its genesis state roots
(consumed by src/config/blockchain.rs:230-315).  Writes them to
bazuka_tpu/config/data/initial_balances.json and
initial_mpn_balances.json as [[address, amount], ...].
"""

import json
import re
import sys
from pathlib import Path

REF = Path(sys.argv[1] if len(sys.argv) > 1 else
           "/root/reference/src/config/initials.rs")
OUT = Path(__file__).resolve().parent.parent / "bazuka_tpu" / "config" / "data"


def main():
    src = REF.read_text()
    l1_src, l2_src = src.split("initial_mpn_balances", 1)
    pat = re.compile(r'"((?:ed|jub)[0-9a-f]+)",\s*\n\s*(\d+)')
    l1 = [(m.group(1), int(m.group(2))) for m in pat.finditer(l1_src)]
    l2 = [(m.group(1), int(m.group(2))) for m in pat.finditer(l2_src)]
    assert all(a.startswith("ed") for a, _ in l1)
    assert all(a.startswith("jub") for a, _ in l2)
    OUT.mkdir(exist_ok=True)
    (OUT / "initial_balances.json").write_text(json.dumps(l1))
    (OUT / "initial_mpn_balances.json").write_text(json.dumps(l2))
    print(f"L1: {len(l1)} entries (sum {sum(a for _, a in l1)})")
    print(f"L2: {len(l2)} entries (sum {sum(a for _, a in l2)})")


if __name__ == "__main__":
    main()

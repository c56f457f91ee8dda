"""Render DECADE_BENCH.json as the markdown table SCALING.md embeds —
the two-decade (sf0.1 -> 1 -> 10) evidence in table form rather than
prose. Prints to stdout; paste/pipe into SCALING.md.

Usage: python tools/decade_table.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    with open(os.path.join(REPO, "DECADE_BENCH.json")) as f:
        d = json.load(f)
    print("| query | sf0.1 s | sf1 s | sf10 s | 0.1→1 | 1→10 |")
    print("|---|---|---|---|---|---|")
    for name in sorted(d):
        r = d[name]
        if not all(k in r for k in ("0.1", "1", "10")):
            continue
        r01, r1, r10 = r["0.1"], r["1"], r["10"]
        print(
            f"| {name} | {r01:.2f} | {r1:.2f} | {r10:.2f} "
            f"| {r1 / max(r01, 0.001):.1f}x | {r10 / max(r1, 0.001):.1f}x |"
        )


if __name__ == "__main__":
    main()

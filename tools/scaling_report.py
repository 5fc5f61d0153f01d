"""Build the BASELINE.md scaling table from two bench JSON lines
(same host, same session-config) at different scale factors.

    python tools/scaling_report.py bench_sf0.1.json bench_sf1.json

Prints a markdown table: per-query seconds at both SFs, the ratio, and
a flag for entries scaling worse than the data multiple.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    mult = big["sf"] / small["sf"]
    qs = small["queries"]
    qb = big["queries"]
    shared = [k for k in qs if k in qb]
    print(f"| query | sf{small['sf']} sec | sf{big['sf']} sec | ratio (data x{mult:.0f}) |")
    print("|---|---|---|---|")
    total_s = total_b = 0.0
    for k in shared:
        r = qb[k] / qs[k]
        flag = " **> data multiple**" if r > mult else ""
        total_s += qs[k]
        total_b += qb[k]
        print(f"| {k} | {qs[k]:.3f} | {qb[k]:.3f} | {r:.2f}x{flag} |")
    print(f"| **total ({len(shared)} shared)** | {total_s:.1f} | {total_b:.1f} | "
          f"{total_b / total_s:.2f}x |")


if __name__ == "__main__":
    main()

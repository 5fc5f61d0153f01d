"""Reconstruct SF1_SWEEP.json from a full_sf1_sweep.py log — every
result is printed as a [sf0.1]/[sf1]/[parity] line, so a sweep cut off
mid-parity (wall-clock cap) still yields the committed artifact;
queries the parity pass never reached record ``not_sampled (sweep time
cap)`` instead of silently vanishing.

    python tools/parse_sweep_log.py /tmp/sf1_sweep2.log [--out SF1_SWEEP.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse(log_path: str) -> dict:
    results: dict[str, dict] = {}
    pat01 = re.compile(r"\[sf0\.1\] (\S+): ([\d.]+|None)")
    pat1 = re.compile(r"\[sf1\] (\S+): ([\d.]+|None)(?: \(([\d.]+)x\))?")
    patp = re.compile(r"\[parity\] (\S+): (.*)")
    text = open(log_path).read().replace("\r", "\n")
    for line in text.splitlines():
        line = line.strip()
        m = pat01.match(line)
        if m:
            v = None if m.group(2) == "None" else float(m.group(2))
            results.setdefault(m.group(1), {})["t_sf01"] = v
            continue
        m = pat1.match(line)
        if m:
            r = results.setdefault(m.group(1), {})
            r["t_sf1"] = None if m.group(2) == "None" else float(m.group(2))
            if m.group(3):
                r["scale_x"] = float(m.group(3))
            continue
        m = patp.match(line)
        if m:
            results.setdefault(m.group(1), {})["parity"] = m.group(2).strip()
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--out", default=os.path.join(REPO, "SF1_SWEEP.json"))
    ap.add_argument(
        "--cap-note",
        default="not_sampled (sweep time cap; oracle verified at sf<=0.1)",
    )
    args = ap.parse_args()
    results = parse(args.log)
    # queries with an oracle the parity pass never reached
    sys.path.insert(0, REPO)
    os.environ.setdefault(
        "SPARK_GRAFT_ORACLE_SF", os.path.join(REPO, ".artifacts", "sf1")
    )
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    for name, r in results.items():
        if "parity" not in r:
            r["parity"] = (
                args.cap_note if name in oracles else "rows_only"
            )
    scale_flagged = sorted(
        (
            (n, r["scale_x"])
            for n, r in results.items()
            if r.get("scale_x", 0) > 10 and (r.get("t_sf1") or 0) > 2.0
        ),
        key=lambda t: -t[1],
    )
    summary = {
        "n_queries": len(results),
        "data_multiple": 10,
        "protocol": "single run per sf in one warmed session",
        "n_hash_ok": sum(
            1 for r in results.values() if r.get("parity") == "hash_ok"
        ),
        "n_rows_only": sum(
            1 for r in results.values() if r.get("parity") == "rows_only"
        ),
        "n_oracle_timeout": sum(
            1 for r in results.values() if r.get("parity") == "oracle_timeout"
        ),
        "n_not_sampled": sum(
            1
            for r in results.values()
            if str(r.get("parity", "")).startswith("not_sampled")
        ),
        "n_fail": sum(
            1
            for r in results.values()
            if str(r.get("parity", "")).startswith(
                ("FAIL", "spark_error", "oracle_error")
            )
        ),
        "over_10x_and_over_2s": scale_flagged,
        "total_sf1_sec": round(
            sum(r.get("t_sf1") or 0 for r in results.values()), 1
        ),
        "total_sf01_sec": round(
            sum(r.get("t_sf01") or 0 for r in results.values()), 1
        ),
    }
    with open(args.out, "w") as f:
        json.dump(
            {"summary": summary, "queries": results}, f, indent=1,
            sort_keys=True,
        )
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()

"""Three-point scale curve sf0.1 → sf1 → sf10 (100x the test default)
for a curated probe of headline operators — the locally-strongest
answer to "would this plan survive a 100x scale-up".

    python tools/make_scaled_sf.py --mult 100 --out .artifacts/sf10
    python tools/sf10_probe.py [--out SCALE_CURVE_SF10.json]

All three points run in ONE warmed session (the sf0.1 pass doubles as
codegen warmup), single timed run per point (the curve's signal is the
RATIO across decades, not the third digit). A healthy plan's ratio per
decade stays at or below ~10x (linear in bytes); the summary lists
every probe entry above it.

Probe selection: the frozen core-12 (cross-round comparability) plus
the families whose scale behavior the verdicts track — iterative
graph (k-core, PageRank, BFS), distributed-rank statistics, the
bounded-default SNM linkage variants, banded/bucketed dedup, and the
composite training-data manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = [
    # frozen core-12
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q10_returned_items", "visits_sessionize", "monthly_usage",
    "retention_cohorts", "doc_quality", "ngram_jaccard_pairs",
    "minhash_lsh_dedup", "knn_bruteforce", "embedding_near_dup",
    # iterative graph family
    "part_k_core", "part_pagerank", "copurchase_bfs_hops",
    # capped serving paths (r9/r10/r11)
    "copurchase_adamic_adar_capped", "customer_fuzzy_match_capped",
    "part_catalog_near_dups_capped", "embedding_near_dup_capped",
    # distributed-rank statistics + sweep-line
    "customer_rfm", "order_value_ks_test", "max_concurrent_visits",
    # dedup breadth + the end-to-end composite
    "simhash_dedup", "substring_dedup_clean", "training_data_manifest",
]

SFS = [
    ("/root/testdata/sf0.1", 0.1),
    (os.path.join(REPO, ".artifacts", "sf1"), 1.0),
    (os.path.join(REPO, ".artifacts", "sf10"), 10.0),
]


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_CURVE_SF10.json"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from dimagi_data_platform_spark.plans.queries import QUERIES
    from dimagi_data_platform_spark.session import get_spark

    spark = get_spark("sf10-probe")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.queries or PROBE
    results: dict[str, dict] = {n: {} for n in names}
    for sf_dir, sf in SFS:
        if not os.path.isdir(sf_dir):
            print(f"missing {sf_dir} — run tools/make_scaled_sf.py first",
                  file=sys.stderr)
            sys.exit(2)
        for n in names:
            t0 = time.time()
            try:
                run_noop(QUERIES[n](spark, sf_dir))
                results[n][f"t_sf{sf:g}"] = round(time.time() - t0, 3)
            except Exception as e:  # noqa: BLE001 - recorded, not raised
                results[n][f"err_sf{sf:g}"] = f"{type(e).__name__}: {e}"[:200]
            print(json.dumps({"query": n, "sf": sf, **{
                k: v for k, v in results[n].items() if str(sf) in k or f"{sf:g}" in k
            }}), flush=True)
    over = []
    for n, r in results.items():
        t01, t1, t10 = r.get("t_sf0.1"), r.get("t_sf1"), r.get("t_sf10")
        if t01 and t1:
            r["x_01_to_1"] = round(t1 / t01, 2)
        if t1 and t10:
            r["x_1_to_10"] = round(t10 / t1, 2)
            if r["x_1_to_10"] > 10:
                over.append((n, r["x_1_to_10"]))
    out = {
        "probe": results,
        "summary": {
            "n_probe": len(names),
            "decade_multiple": 10,
            "over_decade_sf1_to_sf10": sorted(over, key=lambda x: -x[1]),
            "total_sf0.1": round(sum(r.get("t_sf0.1", 0) for r in results.values()), 1),
            "total_sf1": round(sum(r.get("t_sf1", 0) for r in results.values()), 1),
            "total_sf10": round(sum(r.get("t_sf10", 0) for r in results.values()), 1),
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out["summary"]))


if __name__ == "__main__":
    main()

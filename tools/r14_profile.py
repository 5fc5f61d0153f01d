"""Optimization-round profiler: per-query wall time split into
PLANNING (analysis+optimization+physical planning, driver-side) vs
EXECUTION (noop-sink run of the planned query), plus the formatted
physical plan written to plans/r14/<query>_<tag>.txt.

    python tools/r14_profile.py --tag before [--runs 3] [query ...]

Prints one JSON line per query:
  {"query": ..., "plan_s": ..., "exec_runs": [...], "exec_min": ...}
and a final summary line. Timings use the bench protocol (warm once,
min of N noop-sink runs, checkpoints released between runs) so numbers
are comparable with bench_detail.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dimagi_data_platform_spark.plans.queries import QUERIES
from dimagi_data_platform_spark.session import get_spark

DEFAULT_TARGETS = [
    "part_pagerank",
    "order_value_permutation_test",
    "part_catalog_near_dups_capped",
    "simhash_dedup",
    "copurchase_communities",
    "part_hits_authority",
    "copurchase_bfs_hops",
    "customer_fuzzy_match_capped",
    "near_dup_components",
    "minhash_lsh_dedup",
    "co_purchase_triangles",
    "substring_dedup_clean",
    "embedding_near_dup_lsh",
    "copurchase_adamic_adar_capped",
    "customer_rfm",
    "incremental_minhash_dedup",
]


def run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def release_checkpoints(spark) -> None:
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("queries", nargs="*", default=None)
    a = ap.parse_args()
    targets = a.queries or DEFAULT_TARGETS
    names = [n for n in targets if n in QUERIES]
    plans_dir = a.plans_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("r14-profile")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r14-profile:{name}")
        # cold construction + full planning cost (driver-side; part of
        # every timed bench run because the bench rebuilds the plan
        # each pass)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, a.sf_dir)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        plan_s = time.perf_counter() - t0
        with open(os.path.join(plans_dir, f"{name}_{a.tag}.txt"), "w") as f:
            f.write(plan_txt)
        # warm pass (janino compile, page-in) then timed noop runs
        run(df)
        release_checkpoints(spark)
        exec_runs = []
        for _ in range(a.runs):
            t0 = time.perf_counter()
            run(QUERIES[name](spark, a.sf_dir))
            exec_runs.append(round(time.perf_counter() - t0, 3))
            release_checkpoints(spark)
        results[name] = {
            "build_s": round(build_s, 3),
            "plan_s": round(plan_s, 3),
            "exec_runs": exec_runs,
            "exec_min": min(exec_runs),
        }
        print(json.dumps({"query": name, **results[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "total_exec_min": round(
                    sum(r["exec_min"] for r in results.values()), 3
                ),
                "tag": a.tag,
                "n": len(results),
            }
        )
    )


if __name__ == "__main__":
    main()

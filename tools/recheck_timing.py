"""Statistical re-timing of flagged bench entries (VERDICT r6 item 3):
N timed runs per query, interleaved with never-regressed controls in
the SAME session, after a warm-up pass — so a host-noise explanation
is tested against a distribution, not a single number.

    python tools/recheck_timing.py [--sf-dir /root/testdata/sf0.1] \
        [--runs 5] [query ...]

Prints one JSON line per query: {"query": ..., "runs": [...],
"min": ..., "median": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dimagi_data_platform_spark.plans.queries import QUERIES
from dimagi_data_platform_spark.session import get_spark

DEFAULT_TARGETS = ["customer_rfm", "copurchase_bfs_hops"]
CONTROLS = ["q1_pricing_summary", "knn_bruteforce"]


def run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def release_checkpoints(spark) -> None:
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("queries", nargs="*", default=None)
    a = ap.parse_args()
    targets = a.queries or DEFAULT_TARGETS
    names = [n for n in targets + CONTROLS if n in QUERIES]

    spark = get_spark("recheck")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:  # warm-up: codegen + page-in, untimed
        run(QUERIES[n](spark, a.sf_dir))
        release_checkpoints(spark)

    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(a.runs):  # interleaved: host drift hits all alike
        for n in names:
            t0 = time.perf_counter()
            run(QUERIES[n](spark, a.sf_dir))
            times[n].append(round(time.perf_counter() - t0, 3))
            release_checkpoints(spark)

    for n in names:
        xs = times[n]
        print(json.dumps({
            "query": n,
            "role": "target" if n in targets else "control",
            "runs": xs,
            "min": min(xs),
            "median": round(statistics.median(xs), 3),
        }))


if __name__ == "__main__":
    main()

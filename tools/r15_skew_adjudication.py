"""VERDICT r14 item 10: AQE-vs-explicit skew handling, measured at sf1
(the deterministic 10x replica from tools/make_scaled_sf.py).

    python tools/make_scaled_sf.py --mult 10 --out .artifacts/sf1
    python tools/r15_skew_adjudication.py [.artifacts/sf1]

Measures (a) salted_join vs plain join + AQE on the events⋈per_user
idiom demo (key-skew profile printed first), (b) whether any AQE
skew-split appears in the FINAL (post-execution) plans of the capped
linkage/graph paths, (c) the block pair masses the caps bound — the
quantity AQE's join-partition splitting cannot touch because the pair
stream is generated row-locally by explode, not by a join.

Findings (2026-08-18 host, recorded in OPTIMIZATION_r15.md C17):
user_id max/median = 99/66 rows (no hot key), plain join wins 3/3
(0.52 vs 0.99 s min), zero skew-splits anywhere, block masses 20.6M
(nation) / 571M (p_type) pairs vs the caps' linear 2nW streams."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dimagi_data_platform_spark.catalog import load_table
from dimagi_data_platform_spark.operators.skew import salted_join
from dimagi_data_platform_spark.session import get_spark


def run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else ".artifacts/sf1"
    spark = get_spark("r15-skew")
    spark.sparkContext.setLogLevel("ERROR")

    def rel():
        for r in spark.sparkContext._jsc.getPersistentRDDs().values():
            r.unpersist()

    ev = load_table(spark, sf, "events").select("event_id", "user_id", "event_type")
    prof = (
        ev.groupBy("user_id")
        .count()
        .agg(F.max("count"), F.expr("percentile_approx(count, 0.5)"), F.count("*"))
        .collect()[0]
    )
    print("user_id rows: max", prof[0], "median", prof[1], "distinct", prof[2])
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    plain = lambda: ev.join(per_user, "user_id")  # noqa: E731
    salted = lambda: salted_join(ev, per_user, "user_id")  # noqa: E731
    run(plain()); run(salted())
    res = {"plain": [], "salted": []}
    for _ in range(3):
        t0 = time.perf_counter(); run(plain()); res["plain"].append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter(); run(salted()); res["salted"].append(round(time.perf_counter() - t0, 2))
    print(json.dumps(res))

    from dimagi_data_platform_spark.plans.queries import QUERIES

    for name in (
        "customer_fuzzy_match_capped",
        "part_catalog_near_dups_capped",
        "copurchase_adamic_adar_capped",
    ):
        df = QUERIES[name](spark, sf)
        run(df)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        print(name, "skew-split in final plan:", "skew" in txt.lower())
        rel()

    cust = load_table(spark, sf, "customer")
    b = cust.groupBy("c_nationkey").count().agg(F.max("count")).collect()[0][0]
    print("fuzzy block max", b, "-> exact pair mass/block", b * (b - 1) // 2)
    part = load_table(spark, sf, "part")
    b = part.groupBy("p_type").count().agg(F.max("count")).collect()[0][0]
    print("catalog block max", b, "-> exact pair mass/block", b * (b - 1) // 2)


if __name__ == "__main__":
    main()

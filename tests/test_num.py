"""Determinism contract of the numeric aggregation helpers: Spark and
DuckDB must produce bitwise-identical doubles for dsum/davg/qsum on
adversarial inputs (negatives, many partitions, near-tie rounding)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from dimagi_data_platform_spark.functions.num import (
    davg,
    dsum,
    qsum,
    sql_davg,
    sql_dsum,
    sql_qsum,
)

CASES = [
    [1.1, 2.2, 3.3],
    [0.005, 0.015, -0.005],               # half-cent rounding ties
    [-12345.67, 0.01, 12345.66],          # cancellation
    [1e9 + 0.07, -1e9, 123456789.11],     # magnitude spread
    [x * 0.07 - 3.5 for x in range(500)], # many values, negatives
]


def _spark_vals(spark, vals, exprs):
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(8)
    return df.agg(*exprs).collect()[0]


def _duck_vals(vals, select):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    return con.execute(f"SELECT {select} FROM t").fetchone()


def test_dsum_davg_bitwise_match(spark):
    for vals in CASES:
        s = _spark_vals(spark, vals, [dsum("x"), davg("x")])
        d = _duck_vals(vals, f"{sql_dsum('x')}, {sql_davg('x')}")
        assert s[0] == d[0], vals
        assert s[1] == d[1], vals


def test_qsum_bitwise_match_on_products(spark):
    # qsum contract: |value| * 10^digits must stay below 2^53 (Spark's
    # floor yields a long; beyond that the quantized double is not an
    # exact integer and engines may disagree) — cases stay in-domain
    for vals in [c for c in CASES if max(abs(v) for v in c) < 3e6]:
        s = _spark_vals(spark, vals, [qsum(F.col("x") * F.col("x"))])
        d = _duck_vals(vals, sql_qsum("x*x"))
        assert s[0] == d[0], vals


def test_qsum_negative_values(spark):
    # floor on negatives must behave identically (floor, not trunc)
    vals = [-0.15, -0.249999, 0.05]
    s = _spark_vals(spark, vals, [qsum("x")])
    d = _duck_vals(vals, sql_qsum("x"))
    assert s[0] == d[0]


def test_dsum_partition_order_independent(spark):
    vals = CASES[4]
    df1 = spark.createDataFrame([(v,) for v in vals], "x double").repartition(1)
    df32 = spark.createDataFrame([(v,) for v in reversed(vals)], "x double").repartition(32)
    a = df1.agg(dsum("x")).collect()[0][0]
    b = df32.agg(dsum("x")).collect()[0][0]
    assert a == b


def test_query_results_independent_of_shuffle_partitions(spark):
    """End-to-end determinism: float-bearing aggregate queries must
    return bitwise-identical rows when the shuffle layout changes —
    the property the decimal/quantized accumulators exist to provide
    (a cluster reshuffling 100 TB differently than local[32] must not
    change a single bit)."""
    from dimagi_data_platform_spark.plans.queries import QUERIES
    from tests.conftest import SF_SMALL

    names = [
        "q1_pricing_summary",
        "nation_acctbal_stats",
        "running_revenue",
        # round-5 rank-machinery clients: the frozen-boundary rank and
        # the NTILE/percent_rank closed forms must survive a relayout
        "acctbal_deciles",
        "customer_percent_rank",
        "order_value_percentiles",
        # round-5 integer/fixed-point chains
        "daily_value_cusum",
        "session_event_lift",
        "part_ppr",
        # round-7 prefix-sum / sketch / iterative clients: k-group
        # midranks, median-deviation ANOVA, AUC midranks, KMV top-k
        # hash cuts, and the deterministic LPA adoption rule must all
        # survive a relayout
        "order_value_kruskal_wallis",
        "order_value_levene",
        "auc_quality_lang",
        "segment_distinct_kmv",
        "copurchase_communities",
        "daily_trend_test",
    ]
    old = spark.conf.get("spark.sql.shuffle.partitions")

    def snap(name):
        df = QUERIES[name](spark, SF_SMALL)
        return sorted(tuple(r) for r in df.collect())

    try:
        base = {n: snap(n) for n in names}
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        for n in names:
            assert snap(n) == base[n], f"{n} changed under 7 shuffle partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

"""P85: bucketed co-located joins — the write-once/shuffle-never
layout. The plan assertion is the product: joining two co-bucketed
tables must produce NO Exchange on either side, while the same join on
plain parquet shuffles both."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from dimagi_data_platform_spark.sources.bucketed import (
    cobucketed_join,
    write_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.range(0, 5000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 97).alias("o_custkey"),
        (F.col("id") * 3 % 1000).alias("o_total"),
    )
    lines = spark.range(0, 20000).select(
        (F.col("id") % 5000).alias("o_orderkey"),
        (F.col("id") % 7).alias("l_linenumber"),
        (F.col("id") % 50 + 1).alias("l_quantity"),
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", 8)
    write_bucketed(lines, "t_lines_b", "o_orderkey", 8)
    yield orders, lines
    for t in ("t_orders_b", "t_lines_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    """With the broadcast fast-path out of the way (tiny test tables
    would otherwise broadcast, which DISABLES bucketed scans), the
    co-bucketed sort-merge join must read `Bucketed: true` on both
    scans and contain NO Exchange — the layout replaced the shuffle."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, "t_orders_b", "t_lines_b", "o_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # the layout really is the bucketed one, not a coincidence:
        # the same join on the unbucketed frames shuffles
        orders, lines = bucketed_tables
        assert "Exchange" in _plan(orders.join(lines, "o_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_join_rows_match_plain_join(spark, bucketed_tables):
    orders, lines = bucketed_tables
    a = (
        cobucketed_join(spark, "t_orders_b", "t_lines_b", "o_orderkey")
        .groupBy("o_custkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    b = orders.join(lines, "o_orderkey").groupBy("o_custkey").agg(
        F.sum("l_quantity").alias("q")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_mismatched_bucket_counts_still_correct(spark, bucketed_tables):
    """A mismatched-bucket join falls back to shuffling a side —
    results must stay identical (perf degrades, correctness never)."""
    orders, _ = bucketed_tables
    write_bucketed(orders, "t_orders_b4", "o_orderkey", 4)
    try:
        j = cobucketed_join(spark, "t_orders_b4", "t_lines_b", "o_orderkey")
        assert j.count() == 20000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b4")

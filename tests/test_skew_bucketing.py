"""Skew salting correctness + bucketed-join shuffle elimination."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from dimagi_data_platform_spark.catalog import load_table, write_bucketed
from dimagi_data_platform_spark.operators.skew import salted_join
from tests.conftest import SF_SMALL


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_name")
    orders = orders.withColumnRenamed("o_custkey", "custkey")
    cust = cust.withColumnRenamed("c_custkey", "custkey")
    plain = orders.join(cust, "custkey")
    salted = salted_join(orders, cust, "custkey", n_salts=8)
    assert plain.count() == salted.count()
    a = {(r.custkey, r.o_orderkey, r.c_name) for r in plain.collect()}
    b = {(r.custkey, r.o_orderkey, r.c_name) for r in salted.collect()}
    assert a == b


def test_salted_join_is_deterministic(spark):
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey")
    )
    cust = load_table(spark, SF_SMALL, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    one = salted_join(orders, cust, "custkey").count()
    two = salted_join(orders, cust, "custkey").count()
    assert one == two


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_name")
    write_bucketed(orders, "b_orders", ["o_custkey"], 8)
    write_bucketed(cust, "b_customer", ["c_custkey"], 8)
    a = spark.table("b_orders")
    b = spark.table("b_customer")
    # disable broadcast so the join would otherwise shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_custkey == b.c_custkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_aqe_splits_skewed_join_partition(spark):
    """SURVEY §6 claims AQE skew-join handling is on — prove it: a
    join keyed 90% onto one hot key must show skew=true splits in the
    adaptive executed plan once the skew thresholds are in reach of
    the test data size."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(200_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
        )
        dim = spark.range(200_000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        joined = big.join(dim, "k")
        # execute THIS DataFrame's own query so its AdaptiveSparkPlan
        # finalizes (count() would plan a different query)
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_aqe_promotes_shuffle_join_to_broadcast(spark):
    """The other adaptive re-plan SURVEY §6 relies on: a join statically
    planned as shuffle (static broadcast disabled) must finalize as a
    BroadcastHashJoin once AQE observes the small side's true size."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "10MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(100_000).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("payload")
        )
        dim = spark.range(100).select(F.col("id").alias("k"), F.lit("d").alias("d"))
        joined = big.join(dim, "k")
        assert len(joined.collect()) == 100_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime row-level pruning: when one side of a shuffle join is
    made selective by a filter, Spark injects a bloom filter built from
    that side into the probe side's scan — at 100 TB this is the
    difference between shuffling the full fact table and shuffling only
    rows that can possibly match."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(500_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
        )
        joined = big.join(dim.filter(F.col("grp") == 3), "k")
        assert len(joined.collect()) == 71_500
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)

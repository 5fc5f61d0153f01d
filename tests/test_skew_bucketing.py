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

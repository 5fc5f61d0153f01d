"""P89: right-to-be-forgotten cascade EXECUTION — the audit must
equal the P70 blast-radius analysis row for row, deletion must be
complete (no orphaned child rows), and untouched rows must survive
bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from dimagi_data_platform_spark.catalog import load_table
from dimagi_data_platform_spark.operators.erasure import FkEdge, cascade_delete
from tests.conftest import SF_SMALL

EDGES = [
    FkEdge("customer", "c_custkey", "orders", "o_custkey", "o_orderkey"),
    FkEdge("orders", "o_orderkey", "lineitem", "l_orderkey", "l_orderkey"),
]


def _run(spark):
    tables = {
        "customer": load_table(spark, SF_SMALL, "customer"),
        "orders": load_table(spark, SF_SMALL, "orders"),
        "lineitem": load_table(spark, SF_SMALL, "lineitem"),
        "part": load_table(spark, SF_SMALL, "part"),
    }
    seeds = tables["customer"].filter(F.col("c_acctbal") < -900).select(
        "c_custkey"
    )
    cleaned, audit = cascade_delete(tables, "customer", "c_custkey", seeds, EDGES)
    return tables, seeds, cleaned, audit


def test_audit_matches_blast_radius_analysis(spark):
    """The executed deletion's audit counts must equal the P70
    analysis query's prediction (same seed rule)."""
    from dimagi_data_platform_spark.plans.queries import QUERIES

    _, _, _, audit = _run(spark)
    got = {
        r["table_name"]: (r["n_affected"], r["n_total"])
        for r in audit.collect()
    }
    want = {
        r["table_name"]: (r["n_affected"], r["n_total"])
        for r in QUERIES["deletion_cascade_impact"](spark, SF_SMALL).collect()
    }
    for t in ("customer", "orders", "lineitem"):
        assert got[t] == want[t], t
    assert got["part"] == (0, got["part"][1])


def test_cascade_is_complete_no_orphans(spark):
    tables, seeds, cleaned, _ = _run(spark)
    seed_set = {r[0] for r in seeds.collect()}
    # no erased customer remains, nor any of their orders/lines
    assert cleaned["customer"].filter(
        F.col("c_custkey").isin(seed_set)
    ).count() == 0
    assert cleaned["orders"].filter(F.col("o_custkey").isin(seed_set)).count() == 0
    gone_orders = {
        r[0]
        for r in tables["orders"]
        .filter(F.col("o_custkey").isin(seed_set))
        .select("o_orderkey")
        .collect()
    }
    assert cleaned["lineitem"].filter(
        F.col("l_orderkey").isin(gone_orders)
    ).count() == 0


def test_untouched_rows_survive_exactly(spark):
    tables, seeds, cleaned, audit = _run(spark)
    a = {r["table_name"]: r for r in audit.collect()}
    for t in ("customer", "orders", "lineitem", "part"):
        assert cleaned[t].count() == a[t]["n_total"] - a[t]["n_affected"]
    # a surviving customer's row is bitwise intact
    survivor = cleaned["customer"].orderBy("c_custkey").first()
    original = (
        tables["customer"]
        .filter(F.col("c_custkey") == survivor["c_custkey"])
        .first()
    )
    assert tuple(survivor) == tuple(original)


def test_out_of_order_edges_rejected(spark):
    tables, seeds, *_ = _run(spark)
    t = {
        "customer": tables["customer"],
        "orders": tables["orders"],
        "lineitem": tables["lineitem"],
    }
    import pytest

    with pytest.raises(ValueError, match="topological"):
        cascade_delete(t, "customer", "c_custkey", seeds, list(reversed(EDGES)))


def test_convergent_edges_with_mismatched_child_key_raise(spark):
    """Two FK edges converging on one child with DIFFERENT child_key
    values would union by position under mismatched columns and
    silently mis-key the final anti-join — must raise (ADVICE r7)."""
    import pytest

    tables = {
        "customer": load_table(spark, SF_SMALL, "customer"),
        "orders": load_table(spark, SF_SMALL, "orders"),
    }
    seeds = tables["customer"].limit(1).select("c_custkey")
    bad = [
        FkEdge("customer", "c_custkey", "orders", "o_custkey", "o_orderkey"),
        FkEdge("customer", "c_custkey", "orders", "o_custkey", "o_custkey"),
    ]
    with pytest.raises(ValueError, match="child_key"):
        cascade_delete(tables, "customer", "c_custkey", seeds, bad)


def test_convergent_edges_same_child_key_union(spark):
    """Convergent edges that AGREE on child_key merge affected sets
    correctly (the supported DAG shape)."""
    tables = {
        "customer": load_table(spark, SF_SMALL, "customer"),
        "orders": load_table(spark, SF_SMALL, "orders"),
    }
    ck = [r["c_custkey"] for r in tables["customer"].limit(2).collect()]
    seeds = tables["customer"].filter(F.col("c_custkey").isin(ck)).select(
        "c_custkey"
    )
    edges = [
        FkEdge("customer", "c_custkey", "orders", "o_custkey", "o_orderkey"),
        FkEdge("customer", "c_custkey", "orders", "o_custkey", "o_orderkey"),
    ]
    cleaned, audit = cascade_delete(
        tables, "customer", "c_custkey", seeds, edges
    )
    expect = tables["orders"].join(
        seeds.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey",
        "left_semi",
    ).count()
    got = {r["table_name"]: r["n_affected"] for r in audit.collect()}
    assert got["orders"] == expect
    assert cleaned["orders"].join(
        seeds.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey",
        "left_semi",
    ).count() == 0

"""P62b: change-data-feed reads between committed versions — Delta
CDF semantics (insert / delete / update pre+post images) on the
versioned-parquet surface."""

from __future__ import annotations

import pytest

from dimagi_data_platform_spark.sources.versioned import (
    read_changes,
    write_version,
)


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "s", "x"]
    )
    v2 = spark.createDataFrame(
        [(2, "b", 99), (3, "c", 30), (4, "d", 40)], ["k", "s", "x"]
    )
    write_version(v1, p, "2024-01-01T00:00:00")
    write_version(v2, p, "2024-01-02T00:00:00")
    return p


def test_cdf_classifies_all_change_types(spark, table):
    rows = {
        (r["k"], r["_change_type"]): (r["s"], r["x"])
        for r in read_changes(spark, table, 1, 2, ["k"]).collect()
    }
    assert rows == {
        (1, "delete"): ("a", 10),
        (2, "update_preimage"): ("b", 20),
        (2, "update_postimage"): ("b", 99),
        (4, "insert"): ("d", 40),
    }


def test_cdf_empty_when_versions_equal(spark, table):
    assert read_changes(spark, table, 2, 2, ["k"]).count() == 0


def test_cdf_null_values_not_misclassified(spark, tmp_path):
    """A legitimately-NULL value column must not read as 'absent':
    unchanged NULLs produce no change row; NULL→value is an update."""
    p = str(tmp_path / "t2")
    v1 = spark.createDataFrame([(1, None), (2, None)], "k int, x string")
    v2 = spark.createDataFrame([(1, None), (2, "now")], "k int, x string")
    write_version(v1, p, "2024-01-01T00:00:00")
    write_version(v2, p, "2024-01-02T00:00:00")
    ch = read_changes(spark, p, 1, 2, ["k"]).collect()
    kinds = sorted((r["k"], r["_change_type"]) for r in ch)
    assert kinds == [(2, "update_postimage"), (2, "update_preimage")]


def test_bitemporal_point_query(spark, tmp_path):
    """P62c: transaction-time axis (what the warehouse KNEW) composes
    with valid-time axis (what was TRUE): a later restatement must be
    invisible at the earlier tx_ts, visible at the later one."""
    from pyspark.sql import functions as F

    from dimagi_data_platform_spark.operators.scd import scd2_history
    from dimagi_data_platform_spark.sources.versioned import (
        read_bitemporal,
        write_version,
    )

    p = str(tmp_path / "dim")
    obs1 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "bronze", 1),
         (1, "2024-02-01 00:00:00", "silver", 2)],
        "k int, ts string, tier string, seq int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    write_version(
        scd2_history(obs1, "k", "ts", "tier", "seq"), p, "2024-02-02T00:00:00"
    )
    # restatement committed later: the January tier was actually gold
    obs2 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "gold", 1),
         (1, "2024-02-01 00:00:00", "silver", 2)],
        "k int, ts string, tier string, seq int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    write_version(
        scd2_history(obs2, "k", "ts", "tier", "seq"), p, "2024-03-01T00:00:00"
    )

    def tier(tx, valid):
        rows = read_bitemporal(spark, p, tx, valid).collect()
        assert len(rows) == 1
        return rows[0]["tier"]

    # as known in February, January's tier was bronze...
    assert tier("2024-02-15T00:00:00", "2024-01-15 00:00:00") == "bronze"
    # ...as known in March (post-restatement), it was gold
    assert tier("2024-03-02T00:00:00", "2024-01-15 00:00:00") == "gold"
    # valid-time axis: February onward is silver under both beliefs
    assert tier("2024-02-15T00:00:00", "2024-02-15 00:00:00") == "silver"
    assert tier("2024-03-02T00:00:00", "2024-02-15 00:00:00") == "silver"

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

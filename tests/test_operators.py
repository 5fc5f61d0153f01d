"""Unit tests for core operators on constructed edge-case data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dimagi_data_platform_spark.operators.asof import asof_join
from dimagi_data_platform_spark.operators.dedup import exact_dedup, latest_by_key
from dimagi_data_platform_spark.operators.sessionize import sessionize


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_sessionize_gap_boundary(spark):
    # gap exactly == threshold stays in-session; gap > threshold splits
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1),
        (1, _ts("2024-01-01T00:30:00"), 2),          # exactly 1800s → same session
        (1, _ts("2024-01-01T01:00:00.000001"), 3),   # 1800.000001s → new session
        (2, _ts("2024-01-01T00:00:00"), 4),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    out = sessionize(df, "user_id", "ts", 1800, tie_break="event_id")
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_tie_break_same_timestamp(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 2),
        (1, _ts("2024-01-01T00:00:00"), 1),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    out = sessionize(df, "user_id", "ts", 1800, tie_break="event_id")
    assert {r.session_id for r in out.collect()} == {1}


def test_latest_by_key_tie_on_ts_uses_second_key(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 10, "a"),
        (1, _ts("2024-01-01T00:00:00"), 11, "b"),
        (2, _ts("2024-01-01T00:00:00"), 12, "c"),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, id int, v string")
    out = latest_by_key(df, ["k"], ["ts", "id"]).collect()
    assert {(r.k, r.id) for r in out} == {(1, 11), (2, 12)}


def test_exact_dedup_normalizes_whitespace_and_case(spark):
    rows = [(1, "Hello  World"), (2, "hello world"), (3, "other text")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    kept = exact_dedup(df, "text", "doc_id").select("doc_id").collect()
    assert {r.doc_id for r in kept} == {1, 3}


def test_asof_join_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T01:00:00"), 100),
         (1, _ts("2024-01-01T00:00:30"), 101),
         (2, _ts("2024-01-01T01:00:00"), 102)],
        "user_id int, l_ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00")),
         (1, _ts("2024-01-01T00:59:00"))],
        "user_id int, r_ts timestamp",
    )
    right = right.withColumn("matched_ts", F.col("r_ts"))
    out = asof_join(left, right, ["user_id"], "l_ts", "r_ts", ["matched_ts"])
    got = {r.lid: r.matched_ts for r in out.collect()}
    assert got[100] == _ts("2024-01-01T00:59:00")
    assert got[101] == _ts("2024-01-01T00:00:00")
    assert got[102] is None  # user 2 has no right rows


def test_asof_join_inclusive_at_equal_ts(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 1)], "user_id int, l_ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"))], "user_id int, r_ts timestamp"
    ).withColumn("matched_ts", F.col("r_ts"))
    out = asof_join(left, right, ["user_id"], "l_ts", "r_ts", ["matched_ts"]).collect()
    assert out[0].matched_ts == _ts("2024-01-01T00:00:00")


def test_asof_join_forward_nearest_later_and_ties(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T01:00:00"), 100),
         (1, _ts("2024-01-01T02:30:00"), 101),
         (2, _ts("2024-01-01T01:00:00"), 102)],
        "user_id int, l_ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T01:00:00"), 7),   # equal ts -> inclusive
         (1, _ts("2024-01-01T02:00:00"), 8),
         (1, _ts("2024-01-01T03:00:00"), 9)],
        "user_id int, r_ts timestamp, rid int",
    ).withColumn("matched_rid", F.col("rid"))
    out = asof_join(
        left, right, ["user_id"], "l_ts", "r_ts", ["matched_rid"],
        right_tiebreak="rid", direction="forward",
    )
    got = {r.lid: r.matched_rid for r in out.collect()}
    assert got[100] == 7     # equal timestamp matches (inclusive)
    assert got[101] == 9     # nearest LATER, not the earlier 8
    assert got[102] is None  # user 2 has no right rows

    # duplicate-timestamp right rows: greatest tiebreak wins, same as
    # the backward direction
    right2 = spark.createDataFrame(
        [(1, _ts("2024-01-01T02:00:00"), 5), (1, _ts("2024-01-01T02:00:00"), 6)],
        "user_id int, r_ts timestamp, rid int",
    ).withColumn("matched_rid", F.col("rid"))
    one = asof_join(
        left.filter(F.col("lid") == 100), right2, ["user_id"],
        "l_ts", "r_ts", ["matched_rid"], right_tiebreak="rid",
        direction="forward",
    ).collect()
    assert one[0].matched_rid == 6


def test_scd2_history_collapses_runs_and_tiles_timeline(spark):
    from dimagi_data_platform_spark.operators.scd import scd2_history

    obs = spark.createDataFrame(
        [
            # user 1: A A B B A  -> intervals A, B, A
            (1, _ts("2024-01-01T00:00:00"), 1, "A"),
            (1, _ts("2024-01-01T01:00:00"), 2, "A"),
            (1, _ts("2024-01-01T02:00:00"), 3, "B"),
            (1, _ts("2024-01-01T03:00:00"), 4, "B"),
            (1, _ts("2024-01-01T04:00:00"), 5, "A"),
            # user 2: NULL NULL A -> intervals NULL, A (null run collapses)
            (2, _ts("2024-01-01T00:00:00"), 6, None),
            (2, _ts("2024-01-01T01:00:00"), 7, None),
            (2, _ts("2024-01-01T02:00:00"), 8, "A"),
        ],
        "user_id int, ts timestamp, event_id int, attr string",
    )
    out = scd2_history(obs, "user_id", "ts", "attr", "event_id").collect()
    u1 = sorted([r for r in out if r.user_id == 1], key=lambda r: r.valid_from)
    u2 = sorted([r for r in out if r.user_id == 2], key=lambda r: r.valid_from)
    assert [r.attr for r in u1] == ["A", "B", "A"]
    assert [r.attr for r in u2] == [None, "A"]
    for runs in (u1, u2):
        # half-open tiling: each interval closes exactly where the next opens
        for a, b in zip(runs, runs[1:]):
            assert a.valid_to == b.valid_from
        assert runs[-1].valid_to is None
        assert [r.is_current for r in runs] == [False] * (len(runs) - 1) + [True]


def test_global_row_number_matches_single_task_window(spark):
    from pyspark.sql import Window

    from dimagi_data_platform_spark.catalog import load_table
    from dimagi_data_platform_spark.operators.linkage import global_row_number
    from tests.conftest import SF_SMALL

    cust = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_name")
    got = {
        r.c_custkey: r.rn
        for r in global_row_number(cust, ["c_name", "c_custkey"]).collect()
    }
    want = {
        r.c_custkey: r.rn
        for r in cust.withColumn(
            "rn", F.row_number().over(Window.orderBy("c_name", "c_custkey"))
        ).collect()
    }
    assert got == want


def test_propagate_raises_at_round_cap_instead_of_wrong_labels(spark):
    """A 60-vertex path has diameter 59: propagation capped at 5 rounds
    CANNOT have converged, and must say so instead of returning
    partially-merged labels (the silent-wrong-answer mode that linkage
    chains would hit). The star algorithm finishes the same graph
    within its O(log n) bound."""
    import pytest

    from dimagi_data_platform_spark.operators.components import (
        connected_components,
    )

    verts = spark.range(60).selectExpr("id")
    edges = spark.range(59).selectExpr("id AS src", "id + 1 AS dst")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(verts, edges, max_iter=5).collect()
    star = connected_components(
        verts, edges, max_iter=12, algorithm="star"
    ).collect()
    assert {r.component for r in star} == {0} and len(star) == 60


def test_wedge_thin_rate_matches_oracle_case_chain():
    """The Python rate picker and the oracle's CASE chain must agree at
    every boundary — a divergence silently hash-breaks the capped
    Adamic-Adar at exactly the scales the driver never samples."""
    from dimagi_data_platform_spark.plans.queries import (
        MAX_THIN_RATE,
        _wedge_thin_rate,
    )

    B = 4_000_000
    assert _wedge_thin_rate(0, B) == 1
    assert _wedge_thin_rate(B, B) == 1  # <= is kept, not <
    assert _wedge_thin_rate(B + 1, B) == 2
    assert _wedge_thin_rate(2 * B, B) == 2
    assert _wedge_thin_rate(2 * B + 1, B) == 4
    # the chain is capped so a pathological mass can't loop forever
    assert _wedge_thin_rate(10**18, B) == MAX_THIN_RATE
    # SQL chain equivalence over a dense sweep
    def sql_case(mass, budget):
        for r in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096):
            if mass <= r * budget:
                return r
        return 8192

    for mass in range(1, 200):
        for budget in (1, 3, 7, 50):
            assert _wedge_thin_rate(mass, budget) == sql_case(mass, budget), (
                mass,
                budget,
            )

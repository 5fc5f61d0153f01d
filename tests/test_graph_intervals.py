"""Unit tests for connected components and the banded range join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dimagi_data_platform_spark.operators.components import (
    component_clusters,
    connected_components,
)
from dimagi_data_platform_spark.operators.intervals import point_in_interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _cc(spark, n_vertices, edges):
    v = spark.createDataFrame([(i,) for i in range(n_vertices)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(v, e)
    return {r.id: r.component for r in out.collect()}


def test_cc_chain_converges_past_one_hop(spark):
    # 0-1-2-3-4 chain: labels must propagate the full diameter
    got = _cc(spark, 5, [(0, 1), (1, 2), (2, 3), (3, 4)])
    assert got == {i: 0 for i in range(5)}


def test_cc_singletons_and_two_clusters(spark):
    got = _cc(spark, 6, [(1, 2), (4, 3)])
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 3, 5: 5}


def test_cc_edge_direction_irrelevant(spark):
    # min label reachable even when edges point "away" from the min
    assert _cc(spark, 3, [(2, 0), (2, 1)]) == {0: 0, 1: 0, 2: 0}


def test_component_clusters_sizes(spark):
    v = spark.createDataFrame([(i,) for i in range(4)], "id long")
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = component_clusters(connected_components(v, e))
    got = {r.id: (r.component, r.cluster_size) for r in out.collect()}
    assert got == {0: (0, 3), 1: (0, 3), 2: (0, 3), 3: (3, 1)}


def test_interval_join_bucket_spanning(spark):
    # interval spans 3 hourly buckets; points in each bucket match once
    pts = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:10:00")),  # bucket 0, inside
            (2, 10, _ts("2024-01-01T01:30:00")),  # bucket 1, inside
            (3, 10, _ts("2024-01-01T02:20:00")),  # bucket 2, inside
            (4, 10, _ts("2024-01-01T02:40:00")),  # bucket 2, after hi
            (5, 11, _ts("2024-01-01T00:10:00")),  # other key, no interval
        ],
        "event_id long, user_id long, ts timestamp",
    )
    ivals = spark.createDataFrame(
        [(10, 7, _ts("2024-01-01T00:05:00"), _ts("2024-01-01T02:30:00"))],
        "user_id long, session_id long, lo timestamp, hi timestamp",
    )
    out = point_in_interval_join(pts, ivals, key="user_id")
    got = sorted((r.event_id, r.session_id) for r in out.collect())
    assert got == [(1, 7), (2, 7), (3, 7)]


def test_interval_join_inclusive_bounds_no_duplicates(spark):
    pts = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:00:00")),  # == lo
            (2, 10, _ts("2024-01-01T01:00:00")),  # == hi, on bucket edge
        ],
        "event_id long, user_id long, ts timestamp",
    )
    ivals = spark.createDataFrame(
        [(10, 1, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T01:00:00"))],
        "user_id long, session_id long, lo timestamp, hi timestamp",
    )
    out = point_in_interval_join(pts, ivals, key="user_id").collect()
    # both bounds inclusive, and the bucketed join must not emit a
    # (point, interval) pair more than once
    assert sorted(r.event_id for r in out) == [1, 2]


def test_interval_join_equals_naive_join_on_random_data(spark):
    # property check: bucketed equi-join == naive non-equi join, on
    # data randomized across bucket boundaries (seeded, 200 points x
    # 40 intervals, interval widths from sub-bucket to multi-bucket)
    import random

    rnd = random.Random(1234)
    base = dt.datetime(2024, 1, 1)
    pts = [
        (i, rnd.randrange(5), base + dt.timedelta(seconds=rnd.randrange(0, 200_000)))
        for i in range(200)
    ]
    ivals = []
    for j in range(40):
        lo = base + dt.timedelta(seconds=rnd.randrange(0, 180_000))
        hi = lo + dt.timedelta(seconds=rnd.randrange(0, 20_000))
        ivals.append((rnd.randrange(5), j, lo, hi))
    pdf = spark.createDataFrame(pts, "event_id long, user_id long, ts timestamp")
    idf = spark.createDataFrame(
        ivals, "user_id long, session_id long, lo timestamp, hi timestamp"
    )
    bucketed = point_in_interval_join(pdf, idf, key="user_id")
    got = sorted((r.event_id, r.session_id) for r in bucketed.collect())
    naive = (
        pdf.join(idf, "user_id")
        .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
    )
    want = sorted((r.event_id, r.session_id) for r in naive.collect())
    assert got == want


def test_cc_star_long_chain_logarithmic_rounds(spark):
    """large-star/small-star converges in O(log n) rounds on a 10^4-node
    chain — the adversarial case where label propagation needs O(n)."""
    import math

    from dimagi_data_platform_spark.operators.components import _star_components

    n = 10_000
    edges = spark.range(n).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    verts = spark.range(n + 1).select("id")
    labels, rounds = _star_components(verts, edges, "id", "src", "dst", 60)
    assert rounds <= 2 * math.log2(n)
    comps = [r[0] for r in labels.select("component").distinct().collect()]
    assert comps == [0]


def test_cc_star_matches_propagate_on_random_graph(spark):
    import random

    random.seed(7)
    n, m = 400, 300
    edges = spark.createDataFrame(
        [(random.randrange(n), random.randrange(n)) for _ in range(m)],
        "src long, dst long",
    )
    verts = spark.range(n)
    a = {(r.id, r.component) for r in connected_components(verts, edges).collect()}
    b = {
        (r.id, r.component)
        for r in connected_components(verts, edges, algorithm="star").collect()
    }
    assert a == b

"""Point-in-interval (banded range) join.

Joins a stream of timestamped points to an interval table on an equi
key plus ``lo <= ts < hi``. Reference parity: the dimagi platform
assigns form submissions to time-windowed visits of the same mobile
worker; this is that operator generalized.

Scale strategy: a naive plan is an equi-join on the key followed by the
range filter — fine when per-key interval counts are small, but the
join explodes on hot keys (every point x every interval of that key).
``point_in_interval_join`` therefore buckets time into fixed-width
buckets and joins on (key, bucket): each interval is exploded to the
buckets it covers, each point belongs to exactly one bucket, so every
qualifying (point, interval) pair meets exactly once and the join stays
an equi-join Catalyst can shuffle-hash — candidate volume per point is
only the intervals overlapping its bucket, not all intervals of the
key. Pick ``bucket`` ≈ typical interval width so intervals explode to
O(1) buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS_PER_HOUR = 3_600_000_000


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str = "ts",
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_micros: int = MICROS_PER_HOUR,
) -> DataFrame:
    """Inner-join points to intervals of the same ``key`` with
    ``lo <= ts <= hi`` via time-bucketed equi-join.

    Columns of both inputs are preserved (names must not collide apart
    from ``key``). Intervals are half-open-agnostic: the caller's
    lo/hi columns define inclusive bounds.
    """
    b = F.lit(bucket_micros)
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(lo_col)) / b).cast("long"),
                (F.unix_micros(F.col(hi_col)) / b).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        "_bucket", (F.unix_micros(F.col(ts_col)) / b).cast("long")
    )
    return (
        pts.join(ivals, [key, "_bucket"])
        .filter(
            (F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) <= F.col(hi_col))
        )
        .drop("_bucket")
    )

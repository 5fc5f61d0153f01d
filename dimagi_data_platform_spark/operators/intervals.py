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

from pyspark.sql import DataFrame, Window
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


def interval_concurrency(
    intervals: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    out_col: str = "concurrency",
) -> DataFrame:
    """Sweep-line concurrency: one row per interval BOUNDARY with the
    number of intervals open at (and including) that instant.

    Classic overlap counting (max concurrent sessions / room
    occupancy): each interval emits a +1 at ``lo`` and a -1 just after
    ``hi`` (closed intervals: an interval ending exactly when another
    starts still overlaps it), and the concurrency at a boundary is the
    running sum of deltas in (ts, delta DESC) order.

    Scale strategy: a naive ``SUM() OVER (ORDER BY ts)`` is a
    single-task global window. Here the prefix sum is distributed the
    same way :func:`~dimagi_data_platform_spark.operators.linkage.global_row_number`
    distributes the global rank: bucket the boundary stream on the sort
    key with FROZEN sampled range boundaries
    (:func:`~dimagi_data_platform_spark.operators.linkage.frozen_range_pid`
    — boundaries are plan literals, so the offsets branch and the main
    branch can never observe different bucketings the way
    ``repartitionByRange``'s per-recomputation sampling allows), run
    the running sum WITHIN each bucket, then add each bucket's
    cumulative delta offset (a bucket-count-sized aggregate,
    broadcast).

    Output columns: ts, delta (+1/-1 net at that instant), ``out_col``.
    """
    from dimagi_data_platform_spark.operators.linkage import frozen_range_pid

    spark = intervals.sparkSession
    deltas = intervals.select(
        F.col(lo_col).alias("ts"), F.lit(1).alias("delta")
    ).unionAll(
        intervals.select(F.col(hi_col).alias("ts"), F.lit(-1).alias("delta"))
    )
    # collapse to boundary grain first: the prefix-sum stream then holds
    # distinct (ts, sign) rows, not one row per interval end
    grain = deltas.groupBy("ts", F.signum("delta").cast("int").alias("sign")).agg(
        F.sum("delta").alias("delta")
    )
    # materialize the boundary stream once: the boundary sampler, the
    # running-sum branch, and the offsets aggregate all consume it, and
    # each would otherwise re-run the full upstream (e.g. a sessionize
    # + two groupBys for the visits case — measured ~4x the grain cost)
    grain = grain.withColumn("neg_sign", -F.col("sign")).localCheckpoint()
    par = spark.sparkContext.defaultParallelism
    # materialize=False (r15): grain is already checkpointed above —
    # the default would checkpoint the SAME rows a second time (one
    # extra eager job + a duplicate block-manager copy per call)
    parted = frozen_range_pid(grain, ["ts", "neg_sign"], par, materialize=False)
    in_part = Window.partitionBy("__pid").orderBy("ts", F.desc("sign"))
    local = parted.withColumn("__run", F.sum("delta").over(in_part))
    offsets = (
        local.groupBy("__pid")
        .agg(F.sum("delta").alias("__tot"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__tot").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__run") + F.col("__off")).cast("long"))
        .select("ts", F.col("delta").cast("long").alias("delta"), out_col)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str] = ("lo", "hi"),
    right_cols: tuple[str, str] = ("r_lo", "r_hi"),
    bucket_micros: int = MICROS_PER_HOUR,
) -> DataFrame:
    """Inner-join two INTERVAL tables on closed-interval overlap
    (lo_a <= hi_b AND lo_b <= hi_a) — the interval×interval sibling of
    :func:`point_in_interval_join`.

    Scale strategy: both sides explode to the fixed-width time buckets
    they cover and meet in an equi-join on the bucket; a qualifying
    pair would meet once per SHARED bucket, so the join keeps only the
    meeting in the bucket of max(lo_a, lo_b) — each overlapping pair
    survives exactly once, with no post-hoc distinct over the pair
    stream. Candidate volume per row is the opposite side's intervals
    overlapping its buckets, never the whole table; pick
    ``bucket_micros`` ≈ typical interval width so explosion stays O(1)
    per interval. Column names must not collide between the sides.
    """
    lo_l, hi_l = left_cols
    lo_r, hi_r = right_cols
    b = F.lit(bucket_micros)

    def buckets(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    (F.unix_micros(F.col(lo)) / b).cast("long"),
                    (F.unix_micros(F.col(hi)) / b).cast("long"),
                )
            ),
        )

    la = buckets(left, lo_l, hi_l)
    rb = buckets(right, lo_r, hi_r)
    anchor = (
        F.greatest(F.unix_micros(F.col(lo_l)), F.unix_micros(F.col(lo_r))) / b
    ).cast("long")
    return (
        la.join(rb, "_bucket")
        .filter(
            (F.col(lo_l) <= F.col(hi_r))
            & (F.col(lo_r) <= F.col(hi_l))
            & (F.col("_bucket") == anchor)
        )
        .drop("_bucket")
    )

"""Record-linkage helpers: exact distributed global ranking and
sorted-neighborhood candidate generation.

A naive global ``row_number() OVER (ORDER BY ...)`` collapses into ONE
task (the window has no partition key), which is exactly what a 100 TB
sort cannot do. ``global_row_number`` computes the identical rank
distributedly: range-partition on the sort key, rank within each
partition, then add each partition's cumulative row offset (a
partition-count aggregate small enough to broadcast). The result is
deterministic for a total sort key even though range boundaries are
sampled.

Sorted-neighborhood linkage then pairs each record with its ``w``
nearest neighbors in that global order — the classic entity-resolution
candidate generator when no clean blocking key exists (Hernandez &
Stolfo's sorted-neighborhood method): candidate volume is n*w, not
block_size².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, order_cols: list[str], out_col: str = "rn"
) -> DataFrame:
    """1-based global row number in (order_cols) order, computed with
    range partitioning instead of a single-task window. ``order_cols``
    must be a total order (include a unique key) for determinism."""
    par = df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(par, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    in_part = Window.partitionBy("__pid").orderBy(*order_cols)
    ranked = parted.withColumn("__prn", F.row_number().over(in_part))
    # cumulative rows BEFORE each partition: tiny (one row per
    # partition) -> windowed running sum then broadcast back
    offsets = (
        ranked.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__cnt").over(
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
        ranked.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__prn") + F.col("__off")).cast("long"))
        .drop("__pid", "__prn", "__off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    window: int = 3,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, rank_dist) for every two records
    within ``window`` positions of each other in the global
    (order_cols) sort. One distributed rank + one equi-join on the
    anchor rank — shuffle volume n*window rows."""
    ranked = global_row_number(df, order_cols).select(
        F.col(id_col).alias("__id"), "rn"
    )
    anchors = ranked.select(
        F.col("__id").alias("id_a"),
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + window)
        ).alias("rn_b"),
        F.col("rn").alias("rn_a"),
    )
    return (
        anchors.join(
            ranked.select(F.col("__id").alias("id_b"), F.col("rn").alias("rn_b")),
            "rn_b",
        )
        .withColumn("rank_dist", (F.col("rn_b") - F.col("rn_a")).cast("long"))
        .select("id_a", "id_b", "rank_dist")
    )

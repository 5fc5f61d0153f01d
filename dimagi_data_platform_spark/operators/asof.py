"""As-of join (nearest earlier match), Spark-first.

Implemented as the classic union-merge: tag both inputs, union, one
window pass per entity carrying the last non-null right-side value
forward, keep left rows. This is a single shuffle on the `by` key and
per-partition streaming — no range cross-join, no per-row lookup — so
it scales linearly with input size at any skew AQE can split.

Tie semantics: right-side rows sort before left rows at equal
timestamps, i.e. matches are inclusive (right.ts <= left.ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    carry: list[str],
) -> DataFrame:
    """Enrich ``left`` with the most recent earlier ``right`` row.

    ``carry`` columns must not collide with left's columns; carried
    values are NULL when no earlier right row exists.
    """
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = (
        right.select(*by, F.col(right_ts).alias("__ts"), *carry)
        .withColumn("__side", F.lit(0))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carry:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return merged.filter(F.col("__side") == 1).drop("__ts", "__side")

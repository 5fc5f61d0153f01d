"""As-of join (nearest earlier or nearest later match), Spark-first.

Implemented as the classic union-merge: tag both inputs, union, one
window pass per entity carrying the last non-null right-side value
along the traversal direction, keep left rows. This is a single
shuffle on the `by` key and per-partition streaming — no range
cross-join, no per-row lookup — so it scales linearly with input size
at any skew AQE can split.

Tie semantics: right-side rows sort before left rows at equal
timestamps, i.e. matches are inclusive (backward: right.ts <= left.ts;
forward: right.ts >= left.ts).
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
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Enrich ``left`` with the nearest ``right`` row.

    ``direction="backward"`` (default) carries the most recent right
    row at-or-before each left timestamp; ``"forward"`` carries the
    earliest right row at-or-after it — same single-shuffle union-merge
    plan, traversed in the opposite order.

    ``carry`` columns must not collide with left's columns; carried
    values are NULL when no matching right row exists on that side.

    ``right_tiebreak`` names a right-side column that totally orders
    right rows sharing (by, ts) — without it, which duplicate-timestamp
    row is carried depends on partition order. The greatest tiebreak
    value wins in either direction.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt_cols = [*by, F.col(right_ts).alias("__ts"), *carry]
    if right_tiebreak is not None:
        rt_cols.append(F.col(right_tiebreak).alias("__tie"))
    rt = right.select(*rt_cols).withColumn("__side", F.lit(0))
    merged = lt.unionByName(rt, allowMissingColumns=True)
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    # right rows (side 0) sort before left rows at equal ts in BOTH
    # directions -> the match is inclusive of the left timestamp
    order = [ts_order, F.col("__side").asc()]
    if right_tiebreak is not None:
        # left rows carry NULL __tie; they only tie among themselves
        # (same __side), where __tie is constant-NULL, so the ordering
        # of right rows is total and left rows are unaffected. Ascending
        # ties: the LAST right row the window sees before the left row —
        # the carried one — is the greatest tiebreak in both directions.
        order.append(F.col("__tie").asc())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carry:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return merged.filter(F.col("__side") == 1).drop("__ts", "__side", "__tie")

"""Gap-based sessionization — the reference's `visit` construction
(forms by the same user clustered by time proximity) as a Spark window
composition.

Algorithm: per entity, order by (ts, tie-break), mark rows whose gap
from the previous row exceeds the threshold, running-sum the markers to
get a session id. Gap comparison is done in integer microseconds so the
boundary decision is exact and engine-portable.

Scale: exactly one shuffle (hash partition by the entity column); the
two window passes are per-partition streaming, no driver state. Skewed
entities are bounded by per-user event counts; AQE skew handling covers
pathological users.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
    tie_break: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Append an integer ``session_col`` (1-based per entity)."""
    order: list[Column] = [F.col(ts_col)]
    if tie_break:
        order.append(F.col(tie_break))
    w = Window.partitionBy(entity_col).orderBy(*order)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    is_new = (
        F.lag(ts_col).over(w).isNull() | (gap_us > gap_seconds * 1_000_000)
    ).cast("int")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__is_new", is_new).withColumn(
        session_col, F.sum("__is_new").over(w_run)
    ).drop("__is_new")

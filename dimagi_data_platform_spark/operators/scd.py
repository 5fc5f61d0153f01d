"""Slowly-changing-dimension (type 2) history builder.

Warehouse parity: the reference platform rebuilds user/case dimension
tables from an event stream each load; the type-2 form keeps one row
per (key, attribute-value run) with a validity interval instead of
overwriting — the standard shape for "what did this dimension look
like at time T" queries.

Collapse rule: consecutive observations of the SAME attribute value
for a key merge into one interval; a change opens a new interval at
the observation timestamp and closes the previous one at the same
instant ([valid_from, valid_to) half-open, NULL valid_to = current).

Plan: one shuffle (window by key ordered by (ts, tiebreak)) for change
detection, a filter to change rows only, then a second window over the
already-collapsed change rows for the closing timestamps. The second
window runs over #changes rows, not #observations — at 100 TB the
change stream is typically orders of magnitude smaller than the
observation stream, and both windows share the same (key) partitioning
so AQE reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    observations: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(key, attr, valid_from, valid_to, is_current) type-2 intervals.

    ``observations`` is the raw change stream — one row per time a
    (possibly unchanged) attribute value was observed. ``tiebreak_col``
    makes the ordering total when timestamps collide.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # _first distinguishes "no prior row" from "prior attr was NULL",
    # and IS DISTINCT FROM semantics keep NULL-valued runs collapsed
    changed = (
        observations.withColumn("_prev", F.lag(attr_col).over(w))
        .withColumn("_first", F.lag(F.lit(1)).over(w).isNull())
        .filter(
            F.col("_first") | ~F.col(attr_col).eqNullSafe(F.col("_prev"))
        )
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return (
        changed.withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(
            F.col(key_col),
            F.col(attr_col),
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )

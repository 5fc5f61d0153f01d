"""Approximate sketch aggregations — the 100 TB path for distincts and
percentiles.

Exact COUNT(DISTINCT) is a two-phase shuffle of every distinct key;
HLL++ (`approx_count_distinct`) is one pass, fixed memory, mergeable.
Exact percentiles need a full sort per group; KLL/GK-style
`percentile_approx` is one pass with bounded error. Both are the right
default at scale, with the exact queries kept as the correctness gate.

Not SQL-oracle-checkable (engine-specific sketch internals) → rows-only
in the driver gate + error-bound tests in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_cols: list[str], key: str, rsd: float = 0.02
) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(key, rsd).alias(f"approx_distinct_{key}")
    )


def approx_percentiles_by(
    df: DataFrame,
    group_cols: list[str],
    value: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    agg = F.percentile_approx(
        value, F.array(*[F.lit(p) for p in percentiles]), accuracy
    ).alias("approx_pcts")
    out = df.groupBy(*group_cols).agg(agg)
    for i, p in enumerate(percentiles):
        out = out.withColumn(f"p{int(p * 100)}", F.col("approx_pcts")[i])
    return out.drop("approx_pcts")

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


def mg_partials(df: DataFrame, key: str, capacity: int = 64) -> DataFrame:
    """Per-partition Misra-Gries summaries: (key, partial_count), at
    most ``capacity`` rows per partition. The mergeable first stage of
    heavy_hitters — also reused by the streaming maintenance path
    (streaming/heavy_hitters_stream.py), whose per-batch summaries sum
    under the same additive error bound."""
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for val, cnt in pdf[key].value_counts().items():
                counters[val] = counters.get(val, 0) + int(cnt)
            excess = len(counters) - capacity
            if excess > 0:
                by_count = sorted(counters.items(), key=lambda kv: kv[1])
                dec = by_count[excess - 1][1]
                counters = {
                    v: c - dec for v, c in by_count[excess:] if c > dec
                }
        if counters:
            yield pd.DataFrame(
                {key: list(counters), "partial_count": list(counters.values())}
            )

    field = df.schema[key].dataType.simpleString()
    return df.select(key).mapInPandas(
        summarize, schema=f"{key} {field}, partial_count long"
    )


def heavy_hitters(
    df: DataFrame,
    key: str,
    capacity: int = 64,
    top_k: int = 20,
) -> DataFrame:
    """Misra-Gries heavy hitters over ``key`` — (key, est_count) for
    the ``top_k`` most frequent values, without a full groupBy of every
    distinct key.

    Each partition keeps a capped summary of ``capacity`` counters
    (classic Misra-Gries: overflow decrements all counters, evicting
    zeros), so per-partition state is O(capacity) and the shuffle
    carries at most ``capacity`` rows per partition — vs the exact
    groupBy whose shuffle is every distinct key in the dataset. After
    summing per-partition summaries, any value with true frequency
    > N/capacity is guaranteed present, and every estimate e satisfies
    true - N/capacity <= e <= true (per-partition bounds add under
    merge). The estimate is a LOWER bound, so ordering by it never
    promotes a rare key above a frequent one by more than the bound.

    Batches update via vectorized value_counts; the decrement loop
    touches only the O(capacity) summary dict.
    """
    partials = mg_partials(df, key, capacity)
    return (
        partials.groupBy(key)
        .agg(F.sum("partial_count").alias("est_count"))
        .orderBy(F.desc("est_count"), key)
        .limit(top_k)
    )

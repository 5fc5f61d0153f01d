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

from pyspark.sql import Column, DataFrame, Window
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


def _cms_row_buckets(key, width: int, depth: int, seed: int):
    """One struct per sketch row: (row_id, bucket) from independently
    seeded PORTABLE hashes — shared by build and probe so both sides
    hash identically (pure codegen, no Python). The hash is the repo's
    engine-portable idiom (md5 → 60-bit prefix → mod width; identical
    text yields the identical cell in Spark AND DuckDB/Postgres), so a
    sketch built here can be probed — and oracle-checked — anywhere."""
    col = F.col(key) if isinstance(key, str) else key
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_id"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws(":", F.lit(str(seed + i)), col)),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.lit(width)
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key: str, width: int = 2048, depth: int = 4, seed: int = 7
) -> DataFrame:
    """Count-Min Sketch of ``key`` frequencies: (row_id, bucket, cnt),
    at most depth*width rows regardless of input size.

    ONE scan: the depth bucket assignments fan out scan-locally via
    explode, and the aggregate's map-side partials are bounded by
    depth*width counters per task — the shuffle carries sketch cells,
    never keys. Mergeable by construction (cell-wise addition), so
    per-day sketches roll up to any grain with a second tiny aggregate,
    and estimates are one-sided: est >= true always, est <= true +
    eps*N with probability 1 - (1/2)^depth for width = 2/eps (Cormode &
    Muthukrishnan). The exact-groupBy twin stays the correctness gate.
    """
    return (
        df.select(F.explode(_cms_row_buckets(key, width, depth, seed)).alias("rb"))
        .select("rb.row_id", "rb.bucket")
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys_df: DataFrame,
    key: str,
    width: int = 2048,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Point-estimate frequencies for ``keys_df[key]`` from a
    :func:`cms_build` sketch: hash each probe key with the SAME seeded
    chain, broadcast-join the (<= depth*width row) sketch, and take the
    min counter across rows. Probe work scales with the probe set, not
    the corpus the sketch summarized."""
    probes = keys_df.select(
        key, F.explode(_cms_row_buckets(key, width, depth, seed)).alias("rb")
    ).select(key, "rb.row_id", "rb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .groupBy(key)
        .agg(F.min("cnt").cast("long").alias("est_count"))
    )


def kmv_hash(col) -> Column:
    """Portable KMV hash: 15-hex md5 prefix as a 60-bit long — exact
    on both engines (the minhash idiom), so KMV sketches are bitwise-
    reproducible unlike HLL binaries."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_partial(
    df: DataFrame, key: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Per-group KMV sketch: the k smallest DISTINCT hash values of
    ``key`` (dedup before ranking so tie order never matters).
    Returns (group_cols..., h) rows — at most k per group; the
    persistable sketch artifact."""
    h = kmv_hash(key)
    per = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        per.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(*group_cols, "h")
    )


def kmv_merge(
    sketches: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge KMV sketches to the (coarser) ``group_cols`` grain: hash
    SET union, re-take the k smallest. Associative and idempotent —
    per-batch/per-cell partials merge to exactly the sketch of the
    union (the defining mergeable-sketch property, here bitwise)."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        sketches.select(*group_cols, "h")
        .distinct()
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(*group_cols, "h")
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Distinct-count estimate per group: (k-1)/(h_k/2^60) when the
    sketch is full, exact sketch size below k (Bar-Yossef et al.
    2002). ONE IEEE division — hash-checkable end to end."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.max("h").cast("long").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / (F.col("kth_hash").cast("double") / F.lit(float(2**60)))
    )
    return agg.withColumn("approx_distinct", est)

"""Bucketed (hash-clustered) persistent tables — the co-located-join
layout for repeated big-big joins.

At 100 TB the dominant recurring cost of a fact⋈fact join (orders ⋈
lineitem, events ⋈ events) is shuffling BOTH sides on the join key
every run. Writing each side ONCE with ``bucketBy(n, key)`` persists a
layout where rows are already hash-clustered by key into the same
number of buckets; Spark's scan then reports a
``HashPartitioning(key, n)`` output partitioning and the sort-merge
join elides both Exchanges (and with ``sortBy`` both Sorts) — every
subsequent join is scan + merge, no shuffle at all. This is the
write-once/query-many posture the IVF/SQ/minhash indexes use, applied
to the relational layer (Hive bucketing; Spark SQL's v1 bucketed
tables).

Caveats encoded here:
- bucketed writes go through ``saveAsTable`` (the layout lives in the
  session catalog's metastore; plain ``parquet(path)`` cannot record
  bucket metadata);
- BOTH sides must use the SAME bucket count, or Spark falls back to
  shuffling the mismatched side;
- one file per (bucket, task) — repartition by the bucket key first so
  each bucket is one file (``spark.sql.sources.bucketing.enabled`` is
  on by default; small-file explosion is the classic bucketing
  footgun).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    catalog table clustered on ``key``. Repartitions by the key first
    so each bucket lands as one file per bucket, not one per task."""
    writer = (
        df.repartition(n_buckets, key)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata attached
    (``spark.table`` — a raw parquet path read would lose the
    layout)."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Inner-join two co-bucketed tables on ``key``. With matching
    bucket counts the physical plan has NO Exchange on either side
    (asserted in tests/test_bucketed.py) — the join cost is scan +
    merge only, which is the entire point of paying the bucketed
    write once."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), key
    )

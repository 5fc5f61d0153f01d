"""Table catalog: load the star-schema parquet tables from a directory.

Tables mirror TESTDATA.md. ``load_tables`` both returns the DataFrames
and registers them as temp views so plans can be written in either the
DataFrame API or ``spark.sql``.

Scale note: these are plain ``spark.read.parquet`` scans — column
pruning and predicate pushdown are delegated to Catalyst + the parquet
DataSource (verified by plan assertions in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic warehouse
# scale (region/nation are fixed-cardinality; supplier/part/customer are
# orders of magnitude smaller than the fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Columns whose parquet encoding can arrive as TIMESTAMP(NANOS) — read
# as an epoch-nanos LONG under nanosAsLong. A long is ambiguous (most
# long columns are ids/counts), so nanos handling needs this explicit
# per-table allowlist covering EVERY timestamp column of the star
# schema (a datagen that writes one table's timestamps as nanos writes
# them all that way); TIMESTAMP_NTZ columns, by contrast, are
# unambiguous and normalized generically below.
NANOS_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table with engine-portable timestamp
    normalization.

    SESSION-WIDE SIDE EFFECT: sets ``spark.sql.legacy.parquet
    .nanosAsLong=true`` and ``spark.sql.session.timeZone=UTC`` on the
    given session (not just for this read). All timestamp rendering and
    parsing in the session happens in UTC afterwards; a caller that
    needs a different session tz must restore it after loading (the
    engine's own query semantics require UTC — see the inline notes)."""
    # Both confs are runtime-settable and idempotent; set at read time
    # so externally-built sessions — e.g. the correctness driver's
    # vanilla SparkSession — behave like session.get_spark():
    # - nanosAsLong: TIMESTAMP(NANOS) parquet reads as epoch-nanos long
    # - session tz UTC: the NTZ→LTZ cast below interprets naive values
    #   in the session tz; UTC has no DST gaps, so wall clocks
    #   round-trip exactly and unix_micros deltas match the DuckDB
    #   oracle's naive-timestamp arithmetic. (Under an arbitrary tz,
    #   spring-forward-gap wall clocks would not round-trip.)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in NANOS_TS_COLS.get(name, ()):
        if c not in df.columns:
            continue
        if isinstance(df.schema[c].dataType, LongType):
            # epoch-nanos long; test data is µs-precision so exact
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Normalize EVERY TimestampNTZType column (any table): downstream
    # plans assume plain TimestampType — unix_micros and RANGE-frame
    # windows reject NTZ — and which datagen variant produced the
    # parquet shouldn't leak into query code.
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Two tables bucketed the same way join with ZERO shuffle — the
    pattern for repeatedly-joined 100 TB facts (bucket once at ingest,
    every downstream join is exchange-free). Verified by plan assertion
    in tests/test_bucketing.py.
    """
    w = df.write.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode("overwrite").format("parquet").saveAsTable(table_name)


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        if os.path.exists(table_path(sf_dir, name)):
            df = load_table(spark, sf_dir, name)
            out[name] = df
            if register_views:
                df.createOrReplaceTempView(name)
    return out

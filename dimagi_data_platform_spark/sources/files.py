"""File sources/sinks: parquet, CSV, JSON with explicit schemas.

The reference's raw-ingestion layer (API exports landed as files) maps
to schema-enforced reads here. PERMISSIVE mode + a corrupt-record
column keeps bad rows observable instead of silently dropped —
malformed form submissions were a first-class concern in the reference.

Scale: explicit schemas skip the sampling inference pass (a full extra
read at 100 TB); partitioned parquet writes give partition pruning to
every downstream query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the corrupt column, corrupt rows).

    The input is cached: Spark disallows queries that reference only the
    internal corrupt-record column of a raw file scan, and both halves
    reuse the same parsed pass anyway.
    """
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (native vectorized reader; same pushdown/pruning
    behavior as parquet — .explain shows PushedFilters)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    range_col: str,
    n_files: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Range-partition rows across files and sort within each file so
    parquet row-group min/max stats line up with the sort key — scans
    filtered on ``range_col`` then prune most files/row-groups entirely.
    The standard layout optimization for a 100 TB fact table's
    dominant filter column (e.g. received_on / event ts)."""
    (
        df.repartitionByRange(n_files, F.col(range_col))
        .sortWithinPartitions(*(sort_cols or [range_col]))
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 128,
    rebalance: bool = False,
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb`` files and
    return the output file count.

    Streaming ingestion and per-batch upserts leave lakes full of tiny
    files; every downstream scan then pays one task + one footer read
    per file. Compaction sizes output files to the scan's sweet spot
    (~row-group multiples of 128 MB).

    ``rebalance=False`` uses coalesce — NO shuffle, existing splits are
    concatenated into fewer tasks; right when files are uniformly tiny.
    ``rebalance=True`` pays one round-robin shuffle to also even out
    skewed file sizes. File count comes from the actual on-disk byte
    size (driver-side listing — metadata-scale, not data-scale).
    """
    import glob as _glob
    import os as _os

    total_bytes = sum(
        _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(src, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, -(-total_bytes // (target_file_mb << 20)))
    df = spark.read.parquet(src)
    df = df.repartition(n_files) if rebalance else df.coalesce(n_files)
    df.write.mode("overwrite").parquet(dst)
    return n_files


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Multimodal raw-asset ingest: read a directory of opaque binary
    files (images/audio/video) as rows of (path, modificationTime,
    length, content) via Spark's binaryFile source — the scan side of
    the multimodal pipeline (multimodal/binary_ops.py decodes the
    ``content`` column downstream with Arrow kernels).

    Scale: the source lists files driver-side but reads contents in
    executors, one task per file group; ``glob`` (pathGlobFilter)
    prunes at LISTING time, so non-matching files are never opened,
    and column pruning means a query touching only ``length``/``path``
    never reads file bytes at all.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def read_parquet_evolving(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Read a parquet directory whose files were written under
    EVOLVING schemas (columns added over time by successive loads —
    the normal life of a warehouse landing zone).

    With ``schema=None``, footers are reconciled via mergeSchema: the
    result is the union of all file schemas, and files missing a
    column yield NULLs for it. Passing an explicit ``schema`` skips
    the footer sweep (at large file counts the merge pass reads every
    footer — O(files) driver-side work) and projects/NULL-fills
    directly, which is the 100 TB posture: keep the authoritative
    schema in a catalog, not in footers.
    """
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_text_lines(
    spark: SparkSession,
    path: str,
    whole_text: bool = False,
    line_col: str = "value",
) -> DataFrame:
    """Line-oriented (or whole-file) text ingestion — the raw-corpus
    entry point before any structure exists (log shipping, crawl
    dumps, one-doc-per-line corpora). ``whole_text=True`` yields one
    row per FILE (pair with ``input_file_name`` for provenance);
    otherwise one row per line, splittable and parallel.

    Scale: the line reader splits large files on block boundaries like
    any text-based source; whole-file mode is one task per file — use
    it only for file-sized documents.
    """
    df = spark.read.text(path, wholetext=whole_text)
    out = df.withColumnRenamed("value", line_col) if line_col != "value" else df
    return out.withColumn("source_file", F.input_file_name())


def _avro_available(spark: SparkSession) -> bool:
    """True iff the 'avro' DataSource actually resolves in this
    session. Avro has been an EXTERNAL module since Spark 2.4, and a
    bare class probe is NOT sufficient: Spark 4's core jars ship some
    org.apache.spark.sql.avro classes (for from_avro/to_avro) while
    the DataSource registration still needs the external spark-avro
    module — so ask the real resolver."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def _require_avro(spark: SparkSession) -> None:
    if not _avro_available(spark):
        raise RuntimeError(
            "Avro read/write needs the external spark-avro connector "
            "(org.apache.spark:spark-avro_2.13:<spark-version>) on the "
            "classpath — add it via spark.jars.packages. This "
            "container ships only the core avro serialization jars, "
            "which do NOT provide the 'avro' DataSource."
        )


def avro_read_options(avro_schema: str | None = None) -> dict[str, str]:
    """The exact option map handed to the Avro reader — a pure
    function so the config contract is testable without the connector
    (the kafka_options pattern of sources/stream.py). ``avro_schema``
    is an Avro-JSON reader schema: records written with an older
    schema resolve against it (field renames via aliases,
    added-with-default fields filled) — Avro schema evolution, decided
    at read time."""
    opts: dict[str, str] = {}
    if avro_schema is not None:
        opts["avroSchema"] = avro_schema
    return opts


def avro_reader(spark: SparkSession, path: str, avro_schema: str | None = None):
    """Configured DataFrameReader for an Avro read (options from
    :func:`avro_read_options`)."""
    return spark.read.format("avro").options(
        **avro_read_options(avro_schema)
    ), path


def read_avro(
    spark: SparkSession, path: str, avro_schema: str | None = None
) -> DataFrame:
    """Avro source (row-major; the interchange format of Kafka/log
    pipelines — read it once, write parquet for repeated analytics).
    Raises a clear error if the external connector is absent."""
    _require_avro(spark)
    r, p = avro_reader(spark, path, avro_schema)
    return r.load(p)


def avro_write_options(compression: str = "snappy") -> dict[str, str]:
    """Writer option map twin of :func:`avro_read_options`."""
    return {"compression": compression}


def avro_writer(df: DataFrame, compression: str = "snappy",
                partition_by: list[str] | None = None):
    """Configured DataFrameWriter for an Avro write (options from
    :func:`avro_write_options`)."""
    w = df.write.mode("overwrite").format("avro").options(
        **avro_write_options(compression)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w


def write_avro(
    df: DataFrame,
    path: str,
    compression: str = "snappy",
    partition_by: list[str] | None = None,
) -> None:
    _require_avro(df.sparkSession)
    avro_writer(df, compression, partition_by).save(path)

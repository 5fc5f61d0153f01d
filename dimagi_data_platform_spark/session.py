"""SparkSession factory tuned for both local testing and cluster scale.

Design notes (100 TB posture):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and broadcast-join demotion/promotion based on observed sizes.
- ``spark.sql.shuffle.partitions`` defaults to a local-friendly value but
  is env-overridable; on a real cluster AQE coalesces from a high initial
  number, so the initial value should be ~2-3x total cores there.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (naive timestamps) byte-for-byte.
- Arrow enabled for the few Pandas-UDF paths (multimodal decode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from dimagi_data_platform_spark.compat import ensure_protobuf


def get_spark(app_name: str = "dimagi-data-platform-spark") -> SparkSession:
    # Before the JVM starts: transformWithStateInPandas workers need
    # google.protobuf on the PYTHONPATH they inherit from the JVM.
    ensure_protobuf()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # TIMESTAMP(NANOS) parquet columns (events.ts) read as long;
        # catalog.load_table converts them to µs timestamps exactly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write INT64 micros, not legacy INT96: stats-capable (min/max
        # pruning works on ts sort keys) and standard across engines
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Commit and fault in the whole heap at JVM start: on
        # memory-overcommitted hosts (e.g. microVM guests), first-touch
        # page faults during execution stall tasks by seconds; paying
        # them once at startup keeps query timings about the plan.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('SPARK_DRIVER_MEM', '8g')} -XX:+AlwaysPreTouch",
        )
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_MASTER_URL"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()

"""State-store observability for the stateful streaming operators.

A 100 TB streaming deployment's first operational question is "how big
is my state and is the watermark actually evicting it?" — stream-stream
joins, dedup, and session windows all grow unbounded if the watermark
stalls. Spark already measures this per micro-batch (every
``StreamingQueryProgress`` carries a ``stateOperators`` block with
rows-in-state / rows-removed / memory), but only as transient JSON on
the driver. This module turns that feed into a queryable DataFrame so
the numbers can be joined, windowed, alerted on, and parity-checked
like any other table.

- :func:`state_metrics_df` — parse a query's ``recentProgress`` into a
  (batch × operator) DataFrame: rows in state, rows updated, rows
  REMOVED (watermark evictions), memory bytes, and the event-time
  watermark the batch ran with.
- :func:`run_to_sink_with_metrics` — the drain helper
  (``events_stream.run_to_sink`` contract) that also returns the
  metrics DataFrame for the completed run.

Scale posture: ``recentProgress`` is bounded by
``spark.sql.streaming.numRecentProgressUpdates`` (default 100 entries)
regardless of stream lifetime, so the driver-side parse is O(batches ×
operators), never O(rows). For always-on jobs, attach a
``StreamingQueryListener`` that appends each progress to a parquet
sink and read THAT with the same schema — the parse below is the
listener body.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_METRICS_SCHEMA = StructType(
    [
        StructField("batch_id", LongType()),
        StructField("operator_idx", LongType()),
        StructField("operator_name", StringType()),
        StructField("rows_total", LongType()),
        StructField("rows_updated", LongType()),
        StructField("rows_removed", LongType()),
        StructField("memory_used_bytes", LongType()),
        StructField("num_state_partitions", LongType()),
        StructField("watermark", StringType()),
    ]
)


def _progress_rows(progress: dict[str, Any]) -> list[tuple]:
    batch_id = int(progress.get("batchId", -1))
    wm = (progress.get("eventTime") or {}).get("watermark")
    rows = []
    for i, op in enumerate(progress.get("stateOperators") or []):
        rows.append(
            (
                batch_id,
                i,
                op.get("operatorName"),
                int(op.get("numRowsTotal", 0)),
                int(op.get("numRowsUpdated", 0)),
                int(op.get("numRowsRemoved", 0)),
                int(op.get("memoryUsedBytes", 0)),
                int(op.get("numShufflePartitions", 0)),
                wm,
            )
        )
    return rows


def state_metrics_df(spark: SparkSession, query) -> DataFrame:
    """One row per (micro-batch, stateful operator) from the query's
    retained progress history, watermark included. ``query`` is a
    ``StreamingQuery`` (running or terminated — availableNow drains
    keep their progress readable after termination)."""
    rows: list[tuple] = []
    for p in query.recentProgress:
        # pyspark returns progress as dicts; tolerate json strings too
        # (the listener-sink replay path feeds those)
        if isinstance(p, str):
            p = json.loads(p)
        rows.extend(_progress_rows(p))
    df = spark.createDataFrame(rows, STATE_METRICS_SCHEMA)
    return df.withColumn(
        "watermark", F.to_timestamp("watermark", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    )


def run_to_sink_with_metrics(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    mode: str = "append",
) -> DataFrame:
    """Drain all available input into parquet (same exactly-once
    batch_id=<n> layout as ``events_stream.run_to_sink``), then return
    the run's state metrics as a DataFrame."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    q = (
        stream_df.writeStream.outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .foreachBatch(_write)
        .start()
    )
    q.awaitTermination()
    return state_metrics_df(stream_df.sparkSession, q)


class MetricsToParquetListener:
    """StreamingQueryListener that persists every progress's state-
    operator rows to a parquet directory — the always-on companion to
    :func:`state_metrics_df` (whose source, ``recentProgress``, keeps
    only the last ~100 entries): attach once per session and the full
    state-size / eviction history of every query becomes a durable
    table, one file per progress event (idempotent by (query, batch)
    path, so a replayed progress overwrites itself instead of
    duplicating).

    Read it back with ``read_metrics(spark, path)`` — the same schema
    as ``state_metrics_df`` plus (query_id, query_name).
    """

    def __init__(self, spark: SparkSession, path: str):
        from pyspark.sql.streaming import StreamingQueryListener

        self._spark = spark
        self._path = path

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                outer._write(event.progress)

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self._listener = _L()

    def attach(self) -> "MetricsToParquetListener":
        self._spark.streams.addListener(self._listener)
        return self

    def detach(self) -> None:
        self._spark.streams.removeListener(self._listener)

    def _write(self, progress) -> None:
        p = progress
        if isinstance(p, str):
            p = json.loads(p)
        elif not isinstance(p, dict):
            p = json.loads(p.json)
        rows = _progress_rows(p)
        if not rows:
            return
        qid = str(p.get("id", "unknown"))
        name = p.get("name")
        batch = rows[0][0]
        df = self._spark.createDataFrame(rows, STATE_METRICS_SCHEMA)
        (
            df.withColumn("query_id", F.lit(qid))
            .withColumn("query_name", F.lit(name).cast("string"))
            .write.mode("overwrite")
            .parquet(f"{self._path}/query_id={qid}/batch={batch}")
        )


def read_metrics(spark: SparkSession, path: str) -> DataFrame:
    """Read a MetricsToParquetListener sink back as one DataFrame
    (query_id and batch surface as partition columns)."""
    df = spark.read.parquet(path)
    return df.withColumn(
        "watermark", F.to_timestamp("watermark", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    )

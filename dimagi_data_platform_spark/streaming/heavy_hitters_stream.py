"""Streaming heavy-hitters maintenance — a Misra-Gries top-k kept
fresh over an event stream (P52; the streaming twin of the batch
`heavy_hitters` sketch, operators/sketches.py).

Shape: foreachBatch incremental maintenance (the same contract as
anomaly_stream / ingest_dedup). Each micro-batch
1. summarizes its rows into MG partials (at most ``capacity`` rows per
   partition — the batch's bounded-memory sketch),
2. writes them to an idempotent per-batch partition
   (``state_dir/partials/batch_id=N``, overwrite — a replayed batch
   rewrites the same partition, never double-counts),
3. re-merges ALL stored partials into the current top-k report
   (partials sum; the per-summary error bounds ADD, so after B batches
   over N total rows every estimate e satisfies
   true - N/capacity_effective <= e <= true and any key with true
   frequency above the summed bound is guaranteed present).

Step 3 reads sketch-scale state (≤ capacity · partitions rows per
batch), never the stream history — the report costs the same whether
the stream carried 10^4 or 10^12 events. With capacity above the
distinct-key count no decrement ever fires and the report is EXACT —
the regime the batch-equivalence test pins bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dimagi_data_platform_spark.operators.sketches import mg_partials


def merged_heavy_hitters(
    spark: SparkSession, state_dir: str, key: str, top_k: int = 20
) -> DataFrame:
    """Current top-k from the stored per-batch MG partials."""
    return (
        spark.read.parquet(f"{state_dir}/partials")
        .groupBy(key)
        .agg(F.sum("partial_count").cast("long").alias("est_count"))
        .orderBy(F.desc("est_count"), key)
        .limit(top_k)
    )


def run_streaming_heavy_hitters(
    stream: DataFrame,
    key: str,
    state_dir: str,
    report_dir: str,
    checkpoint_dir: str,
    capacity: int = 64,
    top_k: int = 20,
) -> None:
    """Drive the stream with availableNow micro-batches; leaves the
    current top-k report as parquet at ``report_dir``."""
    spark = stream.sparkSession

    def handle(batch: DataFrame, batch_id: int) -> None:
        partials = mg_partials(batch, key, capacity)
        partials.write.mode("overwrite").parquet(
            f"{state_dir}/partials/batch_id={batch_id}"
        )
        merged_heavy_hitters(spark, state_dir, key, top_k).write.mode(
            "overwrite"
        ).parquet(report_dir)

    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

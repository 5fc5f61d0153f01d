"""Streaming KMV distinct-sketch maintenance — mergeable distinct
counts kept fresh over a stream (P87; the streaming twin of the batch
KMV rollup L65, and the bitwise-portable sibling of an HLL-based
streaming distinct).

Shape: foreachBatch incremental maintenance (the cms_stream /
heavy_hitters_stream contract). Each micro-batch
1. sketches its own rows per group (``kmv_partial`` — at most k
   hashes per group),
2. writes the partial to an idempotent per-batch partition
   (``state_dir/parts/batch_id=N``, overwrite — a replayed batch
   rewrites the same partition, never inflates the hash set),
3. the CURRENT sketch is ``kmv_merge`` over ALL stored partials
   (hash-set union → k smallest): because merge is associative and
   idempotent, the merged sketch is EXACTLY the sketch of the whole
   stream — bitwise, not just error-bounded (pinned by the
   batch-equivalence test).

Step 3 reads sketch-scale state (≤ batches · groups · k rows), never
the stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dimagi_data_platform_spark.operators.sketches import (
    kmv_estimate,
    kmv_merge,
    kmv_partial,
)


def merged_kmv(
    spark: SparkSession, state_dir: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Current sketch: hash-set union of every stored per-batch
    partial, re-cut to the k smallest per group."""
    return kmv_merge(spark.read.parquet(f"{state_dir}/parts"), group_cols, k)


def run_streaming_kmv(
    stream: DataFrame,
    key: str,
    group_cols: list[str],
    state_dir: str,
    checkpoint_dir: str,
    k: int = 64,
) -> None:
    """Drive the stream with availableNow micro-batches; leaves the
    per-batch sketch partials under ``state_dir/parts``."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        kmv_partial(batch, key, group_cols, k).write.mode("overwrite").parquet(
            f"{state_dir}/parts/batch_id={batch_id}"
        )

    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def estimate_from_stream_state(
    spark: SparkSession,
    state_dir: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group distinct estimates served from the merged stream
    sketch — (k-1)/(h_k/2^60), exact below k."""
    return kmv_estimate(merged_kmv(spark, state_dir, group_cols, k), group_cols, k)

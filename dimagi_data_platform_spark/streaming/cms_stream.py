"""Streaming Count-Min Sketch maintenance — frequency estimates kept
fresh over an event stream (P54; the streaming twin of the batch
`cms_build`/`cms_estimate` pair, operators/sketches.py).

Shape: foreachBatch incremental maintenance (same contract as
heavy_hitters_stream / ingest_dedup). Each micro-batch
1. sketches its own rows (ONE scan, at most depth*width cells),
2. writes the cells to an idempotent per-batch partition
   (``state_dir/cells/batch_id=N``, overwrite — a replayed batch
   rewrites the same partition, never double-counts),
3. point-estimates any probe set by summing ALL stored cells
   (CMS cells are additive, so the merged sketch IS the sketch of the
   whole stream — error bounds are those of one sketch over the union,
   NOT a sum of per-batch bounds) and broadcasting the tiny result.

Step 3 reads sketch-scale state (≤ batches · depth · width cells),
never the stream history. The batch-equivalence test pins the merged
estimates bitwise-equal to a one-shot batch sketch of the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dimagi_data_platform_spark.operators.sketches import cms_build, cms_estimate


def merged_cms(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current sketch: cell-wise sum of every stored per-batch sketch."""
    return (
        spark.read.parquet(f"{state_dir}/cells")
        .groupBy("row_id", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def run_streaming_cms(
    stream: DataFrame,
    key: str,
    state_dir: str,
    checkpoint_dir: str,
    width: int = 2048,
    depth: int = 4,
    seed: int = 7,
) -> None:
    """Drive the stream with availableNow micro-batches; leaves the
    per-batch sketch cells under ``state_dir/cells``."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        cms_build(batch, key, width=width, depth=depth, seed=seed).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/cells/batch_id={batch_id}")

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
    keys_df: DataFrame,
    key: str,
    width: int = 2048,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Point-estimate probe keys against the merged stream sketch."""
    return cms_estimate(
        merged_cms(spark, state_dir), keys_df, key, width=width, depth=depth, seed=seed
    )

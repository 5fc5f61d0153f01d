"""Incremental SCD2: maintain a type-2 dimension-history table from a
stream of attribute observations.

Each micro-batch closes/extends the affected keys' OPEN intervals and
appends new ones — the streaming twin of
:func:`dimagi_data_platform_spark.operators.scd.scd2_history`, with the
same collapse semantics (batch-equivalence tested).

Incremental shape per batch:
  1. read CURRENT (is_current) intervals of the batch's keys back from
     the history table — partition-pruned to the touched user buckets;
  2. seed them as pseudo-observations at their valid_from (tiebreak -1
     sorts a seed before any real event at the same timestamp), union
     the batch, and re-run the batch collapse over this small frame —
     work is O(batch + touched open intervals), never O(history);
  3. latest-wins upsert on (key, valid_from): re-derived intervals
     replace the stored open rows they extend/close; closed intervals
     are never touched. Only the batch's user-bucket partitions
     rewrite (sources/incremental.py::upsert_partitioned).

Ordering contract: observations must arrive in key-local timestamp
order across batches (standard watermark-ordered ingestion); an event
older than a key's open interval would require reopening closed
history — that is a backfill rebuild, not a streaming merge.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dimagi_data_platform_spark.operators.scd import scd2_history
from dimagi_data_platform_spark.sources.incremental import upsert_partitioned

N_BUCKETS = 16


def _has_data(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def scd2_apply_batch(
    spark: SparkSession,
    new_obs: DataFrame,
    history_path: str,
    batch_id: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "attr",
    tiebreak_col: str = "event_id",
) -> None:
    """The foreachBatch body: merge one observation micro-batch."""
    if new_obs.isEmpty():
        return
    keys = new_obs.select(key_col).distinct()
    seeds = None
    if _has_data(history_path):
        open_rows = (
            spark.read.parquet(history_path)
            .filter(F.col("is_current"))
            .join(F.broadcast(keys), key_col, "left_semi")
        )
        seeds = open_rows.select(
            key_col,
            F.col("valid_from").alias(ts_col),
            F.lit(-1).cast("long").alias(tiebreak_col),
            F.col(attr_col),
        )
    obs = new_obs.select(
        key_col, ts_col, F.col(tiebreak_col).cast("long"), attr_col
    )
    if seeds is not None:
        obs = seeds.union(obs)
    intervals = scd2_history(obs, key_col, ts_col, attr_col, tiebreak_col)
    updates = intervals.withColumn(
        "u_bucket", F.pmod(F.col(key_col), F.lit(N_BUCKETS)).cast("int")
    ).withColumn("_version", F.lit(batch_id).cast("long"))
    upsert_partitioned(
        spark,
        updates,
        history_path,
        # attr in the key: same-timestamp flip-flops yield distinct
        # zero-length intervals sharing (key, valid_from)
        keys=[key_col, "valid_from", attr_col],
        order_col="_version",
        partition_col="u_bucket",
    )


def run_scd2_stream(
    obs_stream: DataFrame,
    history_path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "attr",
    tiebreak_col: str = "event_id",
):
    """Wire the batch body into a writeStream (availableNow drain)."""
    spark = obs_stream.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        scd2_apply_batch(
            spark,
            batch_df,
            history_path,
            batch_id,
            key_col,
            ts_col,
            attr_col,
            tiebreak_col,
        )

    return (
        obs_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

"""Custom stateful streaming operator (applyInPandasWithState):
running per-user totals across micro-batches must converge to the
batch aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from dimagi_data_platform_spark.streaming.events_stream import read_event_stream
from dimagi_data_platform_spark.streaming.stateful import running_user_totals
from tests.test_streaming import _dump_events_as_json


def test_running_user_totals_converge_to_batch(spark, tmp_path):
    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    out = str(tmp_path / "stateful_out")

    def _write(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(_write)
        .start()
        .awaitTermination()
    )

    got = spark.read.parquet(out)
    # last emission per user = lifetime totals
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    final = (
        got.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value", "last_ts")
    )
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("ts").alias("last_ts"),
    )
    g = {r.user_id: (r.n_events, round(r.total_value, 6), r.last_ts) for r in final.collect()}
    b = {r.user_id: (r.n_events, round(r.total_value, 6), r.last_ts) for r in batch.collect()}
    assert g == b


def _has_protobuf() -> bool:
    # activates the vendored pure-python runtime (vendor/README.md)
    # when the container has no protobuf install
    from dimagi_data_platform_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


import pytest  # noqa: E402


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python runner protocol needs google.protobuf, "
    "not installed in this container (pip installs forbidden)",
)
def test_transform_with_state_totals_converge_to_batch(spark, tmp_path):
    """transformWithStateInPandas twin must produce the same lifetime
    totals as the batch aggregate (and as running_user_totals)."""
    from dimagi_data_platform_spark.streaming.stateful import running_user_totals_tws

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    out = str(tmp_path / "tws_out")

    def _write(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    (
        running_user_totals_tws(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(_write)
        .start()
        .awaitTermination()
    )

    got = spark.read.parquet(out)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    final = (
        got.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value", "last_ts")
    )
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("ts").alias("last_ts"),
    )
    g = {r.user_id: (r.n_events, round(r.total_value, 6), r.last_ts) for r in final.collect()}
    b = {r.user_id: (r.n_events, round(r.total_value, 6), r.last_ts) for r in batch.collect()}
    assert g == b

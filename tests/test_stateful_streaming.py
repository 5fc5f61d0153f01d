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


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python runner protocol needs google.protobuf",
)
def test_session_finalize_tws_emits_closed_sessions_once(spark, tmp_path):
    """Timer-driven sessionization: every emitted row is exactly one
    CLOSED batch-equivalent session (same 30-min gap rule), emitted
    exactly once, and sessions provably closed by the final watermark
    are all present."""
    from pyspark.sql import Window

    from dimagi_data_platform_spark.streaming.stateful import (
        SESSION_GAP_MS,
        session_finalize_tws,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    out = str(tmp_path / "tws_sess_out")

    def _write(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    (
        session_finalize_tws(stream, watermark="1 minute")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "tws_sess_ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(_write)
        .start()
        .awaitTermination()
    )
    got_rows = spark.read.parquet(out).collect()
    got = [
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in got_rows
    ]
    assert len(got) == len(set(got)), "duplicate session emission"
    assert got, "no sessions emitted"

    # batch truth: 30-min-gap sessionization over all events
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_ms = SESSION_GAP_MS
    s = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev").isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros("prev")
                    > gap_ms * 1000
                )
            ).cast("int"),
        )
        .withColumn("sid", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    want = {
        (
            r.user_id,
            # TWS state keeps millisecond session bounds
            r.session_start.replace(microsecond=r.session_start.microsecond // 1000 * 1000),
            r.session_end.replace(microsecond=r.session_end.microsecond // 1000 * 1000),
            r.n_events,
            round(r.total_value, 6),
        )
        for r in s.collect()
    }
    for row in got:
        assert row in want, f"emitted session not in batch truth: {row}"
    # coverage: at least half of all batch sessions must have closed
    # (event times span months; only the per-user tail stays open)
    assert len(got) >= len(want) // 2


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python runner protocol needs google.protobuf",
)
def test_session_finalize_tws_merges_late_in_watermark_event(spark, tmp_path):
    """ADVICE r8: a late-but-within-watermark event belonging to an
    earlier session must merge into it (even bridging two pending
    sessions into one), never start a fresh session — which requires
    closed-but-unproven sessions to STAY in state until the watermark
    passes (emission only from handleExpiredTimer)."""
    import json as _json

    from dimagi_data_platform_spark.streaming.events_stream import (
        read_event_stream,
    )
    from dimagi_data_platform_spark.streaming.stateful import (
        session_finalize_tws,
    )

    import os as _os

    d = tmp_path / "late_in"
    d.mkdir()
    mtime = [1_700_000_000]

    def _w(name, rows):
        with open(d / name, "w") as f:
            for i, (uid, ts, val) in enumerate(rows):
                f.write(_json.dumps({
                    "event_id": hash((name, i)) % 10**9,
                    "ts": ts, "user_id": uid,
                    "event_type": "click", "value": val, "props": "{}",
                }) + "\n")
        # the file source orders batches by (mtime, path); same-second
        # writes make batch order nondeterministic and a wrong order
        # advances the watermark past the late event — pin it
        mtime[0] += 60
        _os.utime(d / name, (mtime[0], mtime[0]))

    t0 = "2024-01-01T00:00:00.000000"
    # batch 1: user 1 at t0 and t0+40min -> TWO pending sessions
    _w("b1.json", [(1, t0, 1.0), (1, "2024-01-01T00:40:00.000000", 2.0)])
    # batch 2: late event at t0+10min (within the 1h watermark delay).
    # It is <=30min from BOTH pending sessions -> bridges them into ONE.
    _w("b2.json", [(1, "2024-01-01T00:10:00.000000", 4.0)])
    # batch 3: another user far in the future pushes the watermark past
    # the merged session's close-proof instant (end + gap)
    _w("b3.json", [(2, "2024-01-01T06:00:00.000000", 0.5)])

    stream = read_event_stream(spark, str(d), fmt="json", max_files=1)
    out = str(tmp_path / "late_out")

    def _write(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    (
        session_finalize_tws(stream, watermark="1 hour")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(_write)
        .start()
        .awaitTermination()
    )
    rows = [r for r in spark.read.parquet(out).collect() if r.user_id == 1]
    assert len(rows) == 1, f"expected ONE coalesced session, got {rows}"
    r = rows[0]
    assert r.n_events == 3 and round(r.total_value, 6) == 7.0
    assert r.session_start.minute == 0 and r.session_end.minute == 40

"""Structured Streaming: the streaming session/usage pipelines must
produce exactly the batch results when drained with availableNow."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dimagi_data_platform_spark.catalog import load_table
from dimagi_data_platform_spark.streaming.events_stream import (
    read_event_stream,
    run_to_sink,
    streaming_daily_usage,
    streaming_session_stats,
)
from tests.conftest import SF_SMALL


def _dump_events_as_json(spark, tmp_path, n_files=3):
    ev = load_table(spark, SF_SMALL, "events")
    rows = ev.orderBy("event_id").collect()
    d = tmp_path / "stream_in"
    d.mkdir()
    per = len(rows) // n_files + 1
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        with open(d / f"part{i}.json", "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_id": r.event_id,
                            "ts": r.ts.strftime("%Y-%m-%dT%H:%M:%S.%f"),
                            "user_id": r.user_id,
                            "event_type": r.event_type,
                            "value": r.value,
                            "props": r.props,
                        }
                    )
                    + "\n"
                )
    return str(d), ev


def test_streaming_sessions_match_batch(spark, tmp_path):
    in_dir, ev = _dump_events_as_json(spark, tmp_path)
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_to_sink(streaming_session_stats(stream), out, ckpt)

    got = spark.read.parquet(out)
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("window_start"),
            F.col("sw.end").alias("window_end"),
            "n_events",
        )
    )
    g = {(r.user_id, r.window_start): r.n_events for r in got.collect()}
    b = {(r.user_id, r.window_start): (r.n_events, r.window_end) for r in batch.collect()}
    # append mode: emitted sessions must exactly match their batch twin...
    for key, n in g.items():
        assert b[key][0] == n
    # ...and every session closed before the final watermark must have
    # been emitted (sessions still open at stream end legitimately stay
    # in state — that is append-mode semantics, not data loss)
    max_ts = max(r.ts for r in ev.select("ts").collect())
    import datetime as dt

    final_wm = max_ts - dt.timedelta(hours=2)
    for key, (n, end) in b.items():
        if end <= final_wm:
            assert key in g and g[key] == n


def test_streaming_daily_usage_match_batch(spark, tmp_path):
    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=2)
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    out = str(tmp_path / "out2")
    run_to_sink(streaming_daily_usage(stream), out, str(tmp_path / "ckpt2"))

    got = spark.read.parquet(out)
    batch = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("day_start"),
            F.col("w.end").alias("day_end"),
            "user_id",
            "n_events",
        )
    )
    g = {(r.user_id, r.day_start): r.n_events for r in got.collect()}
    b = {(r.user_id, r.day_start): (r.n_events, r.day_end) for r in batch.collect()}
    for key, n in g.items():
        assert b[key][0] == n
    max_ts = max(r.ts for r in ev.select("ts").collect())
    import datetime as dt

    final_wm = max_ts - dt.timedelta(days=1)
    for key, (n, end) in b.items():
        if end <= final_wm:
            assert key in g and g[key] == n


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    """Two availableNow drains against one checkpoint: a row arriving
    in drain 2 with event time OLDER than the checkpointed watermark
    must not resurrect its already-emitted window — the late-data
    eviction contract the watermark claims."""

    def write_file(path, rows):
        with open(path, "w") as f:
            for eid, ts, uid, v in rows:
                f.write(
                    json.dumps(
                        {
                            "event_id": eid,
                            "ts": ts,
                            "user_id": uid,
                            "event_type": "click",
                            "value": v,
                            "props": "{}",
                        }
                    )
                    + "\n"
                )

    in_dir = tmp_path / "late_in"
    in_dir.mkdir()
    out, ckpt = str(tmp_path / "late_out"), str(tmp_path / "late_ckpt")
    # drain 1: one event on Jan 1, one on Jan 3 -> watermark = Jan 2
    # 12:00, so the [Jan 1, Jan 2) window closes and is emitted
    write_file(
        in_dir / "f1.json",
        [
            (1, "2024-01-01T10:00:00.000000", 7, 1.0),
            (2, "2024-01-03T12:00:00.000000", 7, 1.0),
        ],
    )
    stream = read_event_stream(spark, str(in_dir), fmt="json", max_files=1)
    run_to_sink(streaming_daily_usage(stream), out, ckpt)
    first = {
        (r.user_id, r.day_start): (r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    import datetime as dt

    jan1 = (7, dt.datetime(2024, 1, 1))
    assert first[jan1] == (1, 1.0)

    # drain 2: a LATE Jan 1 row (before the checkpointed watermark) and
    # a Jan 6 row that advances the watermark past the Jan 3 window
    write_file(
        in_dir / "f2.json",
        [
            (3, "2024-01-01T11:00:00.000000", 7, 100.0),
            (4, "2024-01-06T00:30:00.000000", 7, 1.0),
        ],
    )
    stream2 = read_event_stream(spark, str(in_dir), fmt="json", max_files=1)
    run_to_sink(streaming_daily_usage(stream2), out, ckpt)
    final = {}
    for r in spark.read.parquet(out).collect():
        key = (r.user_id, r.day_start)
        assert key not in final, f"window {key} emitted twice"
        final[key] = (r.n_events, r.total_value)
    # late row dropped: Jan 1 window unchanged, emitted exactly once
    assert final[jan1] == (1, 1.0)
    # watermark advanced -> the Jan 3 window closed with its one row
    assert final[(7, dt.datetime(2024, 1, 3))] == (1, 1.0)


def test_streaming_dedup_drops_resubmissions(spark, tmp_path):
    from dimagi_data_platform_spark.streaming.events_stream import streaming_dedup

    # two files: the second re-submits every event of the first (same
    # event_id, later arrival) plus genuinely new events
    ev = load_table(spark, SF_SMALL, "events")
    rows = ev.orderBy("event_id").limit(200).collect()
    d = tmp_path / "dedup_in"
    d.mkdir()

    def dump(path, chunk):
        with open(path, "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_id": r.event_id,
                            "ts": r.ts.strftime("%Y-%m-%dT%H:%M:%S.%f"),
                            "user_id": r.user_id,
                            "event_type": r.event_type,
                            "value": r.value,
                            "props": r.props,
                        }
                    )
                    + "\n"
                )

    dump(d / "part0.json", rows[:100])
    dump(d / "part1.json", rows[:100] + rows[100:200])  # resubmits first 100

    stream = read_event_stream(spark, str(d), fmt="json", max_files=1)
    out = str(tmp_path / "dedup_out")
    run_to_sink(streaming_dedup(stream), out, str(tmp_path / "dedup_ckpt"))

    got = spark.read.parquet(out)
    ids = [r.event_id for r in got.select("event_id").collect()]
    assert len(ids) == len(set(ids)), "resubmitted ids must be dropped"
    assert set(ids) == {r.event_id for r in rows}, "every unique event kept"


def test_streaming_enrich_matches_batch_join(spark, tmp_path):
    from dimagi_data_platform_spark.streaming.events_stream import streaming_enrich

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=2)
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_total"))
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    out = str(tmp_path / "enrich_out")
    run_to_sink(
        streaming_enrich(stream, dim).select("event_id", "user_id", "user_total"),
        out,
        str(tmp_path / "enrich_ckpt"),
    )
    got = {r.event_id: r.user_total for r in spark.read.parquet(out).collect()}
    want = {
        r.event_id: r.user_total
        for r in ev.join(dim, "user_id").select("event_id", "user_total").collect()
    }
    assert got == want


def test_run_to_sink_batch_replay_is_idempotent(spark, tmp_path):
    """Re-writing a batch id overwrites its own output instead of
    appending a duplicate (the foreachBatch retry contract)."""
    df = spark.range(5).select(F.col("id").cast("long").alias("id"))
    out = str(tmp_path / "sink_out")
    # simulate the foreachBatch body running twice for the same batch
    df.write.mode("overwrite").parquet(f"{out}/batch_id=0")
    df.write.mode("overwrite").parquet(f"{out}/batch_id=0")
    assert spark.read.parquet(out).count() == 5


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream click-attribution join drained with availableNow
    must equal the equivalent batch join."""
    from dimagi_data_platform_spark.streaming.events_stream import (
        streaming_interval_join,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    clicks_s = read_event_stream(spark, in_dir, fmt="json", max_files=1).filter(
        F.col("event_type") == "click"
    )
    purch_s = read_event_stream(spark, in_dir, fmt="json", max_files=1).filter(
        F.col("event_type") == "purchase"
    )
    out = str(tmp_path / "ssj_out")
    run_to_sink(
        streaming_interval_join(clicks_s, purch_s),
        out,
        str(tmp_path / "ssj_ckpt"),
    )
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.read.parquet(out).collect()
    }

    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
    )
    want = {(r.p_user, r.purchase_id, r.click_id) for r in batch.collect()}
    assert got == want and len(want) > 0


def _tier_obs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    tier = F.floor(
        F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int") / F.lit(25)
    ).cast("int")
    return ev.select("user_id", "ts", "event_id", tier.alias("attr"))


def test_scd2_incremental_batches_match_batch_history(spark, tmp_path):
    """Three in-order micro-batches merged incrementally must produce
    exactly the history the one-shot batch collapse produces."""
    from dimagi_data_platform_spark.operators.scd import scd2_history
    from dimagi_data_platform_spark.streaming.scd2_stream import scd2_apply_batch

    obs = _tier_obs(spark, SF_SMALL).orderBy("ts", "event_id").localCheckpoint()
    bounds = [r[0] for r in obs.selectExpr(
        "percentile_approx(unix_micros(ts), array(0.34, 0.67), 10000) AS p"
    ).select(F.explode("p")).collect()]
    chunks = [
        obs.filter(F.unix_micros("ts") <= bounds[0]),
        obs.filter(
            (F.unix_micros("ts") > bounds[0]) & (F.unix_micros("ts") <= bounds[1])
        ),
        obs.filter(F.unix_micros("ts") > bounds[1]),
    ]
    hist = str(tmp_path / "scd2_history")
    for i, chunk in enumerate(chunks):
        scd2_apply_batch(spark, chunk, hist, batch_id=i)

    got = {
        (r.user_id, r.valid_from, r.attr, r.valid_to, r.is_current)
        for r in spark.read.parquet(hist).collect()
    }
    want = {
        (r.user_id, r.valid_from, r.attr, r.valid_to, r.is_current)
        for r in scd2_history(obs, "user_id", "ts", "attr", "event_id").collect()
    }
    assert got == want


def test_scd2_stream_availablenow_matches_batch(spark, tmp_path):
    """Drive the same merge through a real file-source stream, one file
    per micro-batch."""
    from dimagi_data_platform_spark.operators.scd import scd2_history
    from dimagi_data_platform_spark.streaming.scd2_stream import run_scd2_stream

    obs = _tier_obs(spark, SF_SMALL).orderBy("ts", "event_id").localCheckpoint()
    src = str(tmp_path / "obs_files")
    bounds = [r[0] for r in obs.selectExpr(
        "percentile_approx(unix_micros(ts), array(0.5), 10000) AS p"
    ).select(F.explode("p")).collect()]
    # two files written in time order; maxFilesPerTrigger=1 -> 2 batches
    obs.filter(F.unix_micros("ts") <= bounds[0]).coalesce(1).write.parquet(
        src + "/f0"
    )
    obs.filter(F.unix_micros("ts") > bounds[0]).coalesce(1).write.parquet(
        src + "/f1"
    )
    stream = (
        spark.readStream.schema(obs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src + "/f*")
    )
    hist = str(tmp_path / "hist")
    q = run_scd2_stream(stream, hist, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {
        (r.user_id, r.valid_from, r.attr, r.valid_to, r.is_current)
        for r in spark.read.parquet(hist).collect()
    }
    want = {
        (r.user_id, r.valid_from, r.attr, r.valid_to, r.is_current)
        for r in scd2_history(obs, "user_id", "ts", "attr", "event_id").collect()
    }
    assert got == want


def test_streaming_ingest_dedup_grows_index_across_batches(spark, tmp_path):
    """Dedup-at-ingest: batch 1 drops its in-batch near-dup; batch 2's
    near-dup of a batch-1 SURVIVOR is dropped by the index probe; fresh
    docs pass. The index then contains exactly the survivors."""
    from dimagi_data_platform_spark.streaming.ingest_dedup import run_ingest_dedup

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm stone wall near the garden gate today"
    )
    other = (
        "completely different content about spark partitions and "
        "shuffles executed across a very large analytics cluster"
    )
    third = (
        "another unrelated document mentioning parquet files and "
        "columnar storage formats with page level statistics"
    )
    in_dir = tmp_path / "ingest_in"
    in_dir.mkdir()

    def write_file(name, rows):
        with open(in_dir / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    # batch 1: 1 and 2 are near-dups of each other (2 dropped in-batch)
    write_file("b1.json", [(1, base), (2, base.replace("today", "tonight")), (3, other)])
    # batch 2: 4 near-dups survivor 1 (dropped via index), 5 is fresh
    write_file("b2.json", [(4, base.replace("dog", "hound")), (5, third)])

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    index, out, ckpt = (
        str(tmp_path / "sig_idx"),
        str(tmp_path / "docs_out"),
        str(tmp_path / "ingest_ckpt"),
    )
    run_ingest_dedup(stream, index, out, ckpt, min_est_jaccard=0.4)

    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 3, 5}
    indexed = {r.doc_id for r in spark.read.parquet(index).collect()}
    assert indexed == {1, 3, 5}


def test_streaming_scd2_enrich_matches_batch_asof_semantics(spark, tmp_path):
    """Each streamed event must pick the dimension version valid AT ITS
    EVENT TIME — identical to the batch join on the same history, and
    exactly one version per event (SCD2 tiling)."""
    import datetime as dt

    from dimagi_data_platform_spark.operators.scd import scd2_history
    from dimagi_data_platform_spark.streaming.events_stream import (
        streaming_scd2_enrich,
    )

    obs = spark.createDataFrame(
        [
            (7, dt.datetime(2024, 1, 1), 1, "bronze"),
            (7, dt.datetime(2024, 1, 3), 2, "gold"),
            (8, dt.datetime(2024, 1, 2), 3, "silver"),
        ],
        "user_id int, ts timestamp, event_id int, attr string",
    )
    hist = scd2_history(obs, "user_id", "ts", "attr", "event_id")

    in_dir = tmp_path / "scd2_enrich_in"
    in_dir.mkdir()
    events = [
        (1, "2024-01-02T00:00:00.000000", 7),   # bronze era
        (2, "2024-01-03T00:00:00.000000", 7),   # gold from its valid_from on
        (3, "2024-01-04T00:00:00.000000", 8),   # silver (open interval)
        (4, "2024-01-01T00:00:00.000000", 8),   # before any version -> null
    ]
    with open(in_dir / "ev.json", "w") as f:
        for eid, ts, uid in events:
            f.write(json.dumps({"event_id": eid, "ts": ts, "user_id": uid,
                                "event_type": "click", "value": 1.0,
                                "props": "{}"}) + "\n")
    stream = read_event_stream(spark, str(in_dir), fmt="json", max_files=1)
    out, ckpt = str(tmp_path / "scd2_enrich_out"), str(tmp_path / "scd2_enrich_ckpt")
    run_to_sink(streaming_scd2_enrich(stream, hist), out, ckpt)

    got = {r.event_id: r.attr for r in spark.read.parquet(out).collect()}
    assert got == {1: "bronze", 2: "gold", 3: "silver", 4: None}
    # batch twin: same join, same answer, one row per event
    batch_ev = spark.read.json(
        str(in_dir), schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    batch = streaming_scd2_enrich(batch_ev, hist)
    assert batch.count() == len(events)
    assert {r.event_id: r.attr for r in batch.collect()} == got


def test_streaming_anomalies_match_batch(spark, tmp_path):
    """The streamed report must be bitwise equal to the batch P35 query
    over the same events, including across multiple micro-batches."""
    import __spark_entry__ as em
    from dimagi_data_platform_spark.streaming.anomaly_stream import (
        run_streaming_anomalies,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    run_streaming_anomalies(
        stream,
        state_dir=str(tmp_path / "state"),
        report_dir=str(tmp_path / "report"),
        checkpoint_dir=str(tmp_path / "ckpt_anom"),
    )
    got = {
        r.day: (r.n_events, r.n_baseline_days, r.z_score, r.is_anomaly)
        for r in spark.read.parquet(str(tmp_path / "report")).collect()
    }
    want = {
        r.day: (r.n_events, r.n_baseline_days, r.z_score, r.is_anomaly)
        for r in em.queries()["daily_event_anomalies"](spark, SF_SMALL).collect()
    }
    assert got == want  # exact integer sums + identical IEEE chain


def test_streaming_heavy_hitters_exact_regime_matches_batch(spark, tmp_path):
    """With capacity above the distinct-key count no MG decrement ever
    fires, so the streamed report over 3 micro-batches is EXACT — it
    must equal a plain groupBy count over the same events, bitwise."""
    from dimagi_data_platform_spark.streaming.heavy_hitters_stream import (
        run_streaming_heavy_hitters,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    run_streaming_heavy_hitters(
        stream,
        key="event_type",
        state_dir=str(tmp_path / "hh_state"),
        report_dir=str(tmp_path / "hh_report"),
        checkpoint_dir=str(tmp_path / "hh_ckpt"),
        capacity=64,
        top_k=10,
    )
    got = {
        r.event_type: r.est_count
        for r in spark.read.parquet(str(tmp_path / "hh_report")).collect()
    }
    want = {
        r.event_type: r.cnt
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    assert got == want


def test_streaming_heavy_hitters_replay_idempotent(spark, tmp_path):
    """Re-running the drained stream with the SAME checkpoint replays
    nothing; re-writing a batch partition manually (the replay path)
    leaves the merged report unchanged."""
    from dimagi_data_platform_spark.operators.sketches import mg_partials
    from dimagi_data_platform_spark.streaming.heavy_hitters_stream import (
        merged_heavy_hitters,
        run_streaming_heavy_hitters,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=2)
    state = str(tmp_path / "hh2_state")
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    run_streaming_heavy_hitters(
        stream,
        key="event_type",
        state_dir=state,
        report_dir=str(tmp_path / "hh2_report"),
        checkpoint_dir=str(tmp_path / "hh2_ckpt"),
    )
    before = [
        (r.event_type, r.est_count)
        for r in merged_heavy_hitters(spark, state, "event_type").collect()
    ]
    # simulate the failure-replay of batch 0: rewrite its partition
    batch0 = spark.read.json(
        in_dir + "/part0.json",
        schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    mg_partials(batch0, "event_type", 64).write.mode("overwrite").parquet(
        f"{state}/partials/batch_id=0"
    )
    after = [
        (r.event_type, r.est_count)
        for r in merged_heavy_hitters(spark, state, "event_type").collect()
    ]
    assert before == after


def test_streaming_heavy_hitters_eviction_regime_bounds(spark, tmp_path):
    """With a tiny capacity the estimates are lower bounds within the
    summed N/capacity error, and the true top key is still ranked
    first — the MG guarantee under per-batch merging."""
    from dimagi_data_platform_spark.streaming.heavy_hitters_stream import (
        run_streaming_heavy_hitters,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    run_streaming_heavy_hitters(
        stream,
        key="user_id",
        state_dir=str(tmp_path / "hh3_state"),
        report_dir=str(tmp_path / "hh3_report"),
        checkpoint_dir=str(tmp_path / "hh3_ckpt"),
        capacity=8,
        top_k=5,
    )
    est = {
        r.user_id: r.est_count
        for r in spark.read.parquet(str(tmp_path / "hh3_report")).collect()
    }
    true = {
        r.user_id: r.cnt
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    n_total = sum(true.values())
    for uid, e in est.items():
        assert e <= true[uid]
        assert e >= true[uid] - n_total / 8


def test_streaming_interval_join_outer_emits_unmatched(spark, tmp_path):
    """LEFT OUTER stream-stream join: matched pairs equal the batch
    inner join; NULL-click rows appear only for truly unmatched
    purchases, and every unmatched purchase old enough for the final
    watermark to have proven no-match is emitted."""
    from dimagi_data_platform_spark.streaming.events_stream import (
        streaming_interval_join_outer,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    purch_s = read_event_stream(spark, in_dir, fmt="json", max_files=1).filter(
        F.col("event_type") == "purchase"
    )
    clicks_s = read_event_stream(spark, in_dir, fmt="json", max_files=1).filter(
        F.col("event_type") == "click"
    )
    out = str(tmp_path / "ssjo_out")
    run_to_sink(
        streaming_interval_join_outer(purch_s, clicks_s),
        out,
        str(tmp_path / "ssjo_ckpt"),
    )
    rows = spark.read.parquet(out).collect()
    got_matched = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in rows
        if r.click_id is not None
    }
    got_unmatched = {r.purchase_id for r in rows if r.click_id is None}

    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour"))
    )
    want_matched = {
        (r.p_user, r.purchase_id, r.click_id) for r in c.join(p, cond).collect()
    }
    assert got_matched == want_matched and len(want_matched) > 0

    matched_ids = {pid for _, pid, _ in want_matched}
    all_p = {r.purchase_id: r.purchase_ts for r in p.collect()}
    want_unmatched = set(all_p) - matched_ids
    # every emitted NULL row is a genuinely unmatched purchase...
    assert got_unmatched <= want_unmatched
    # ...and completeness where the watermark PROVABLY passed: the
    # watermark applied to a batch is derived from the batches before
    # it, so only the first file's purchases (roughly the oldest third
    # of a 30-day span, far below the last applied watermark) are
    # guaranteed flushed by the availableNow drain
    first_file = spark.read.json(
        in_dir + "/part0.json",
        schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    first_ids = {
        r.event_id
        for r in first_file.filter(F.col("event_type") == "purchase").collect()
    }
    overdue = want_unmatched & first_ids
    assert overdue <= got_unmatched and len(got_unmatched) > 0


def test_streaming_interval_join_full_reconciles_both_sides(spark, tmp_path):
    """FULL OUTER stream-stream join (VERDICT r8 item 2): matched pairs
    equal the batch inner join; NULL-click rows are genuinely
    unmatched purchases and NULL-purchase rows genuinely unmatched
    clicks; and on BOTH sides every first-file row the final watermark
    provably closed is present — the streaming twin of the R48 batch
    full-outer reconcile."""
    from dimagi_data_platform_spark.streaming.events_stream import (
        streaming_interval_join_full,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    purch_s = read_event_stream(spark, in_dir, fmt="json", max_files=1).filter(
        F.col("event_type") == "purchase"
    )
    clicks_s = read_event_stream(spark, in_dir, fmt="json", max_files=1).filter(
        F.col("event_type") == "click"
    )
    out = str(tmp_path / "ssjf_out")
    run_to_sink(
        streaming_interval_join_full(purch_s, clicks_s),
        out,
        str(tmp_path / "ssjf_ckpt"),
    )
    rows = spark.read.parquet(out).collect()
    got_matched = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in rows
        if r.click_id is not None and r.purchase_id is not None
    }
    got_null_click = {r.purchase_id for r in rows if r.click_id is None}
    got_null_purch = {r.click_id for r in rows if r.purchase_id is None}
    # a full-outer row never has BOTH sides NULL
    assert all(
        r.purchase_id is not None or r.click_id is not None for r in rows
    )
    # and user_id is populated from whichever side exists
    assert all(r.user_id is not None for r in rows)

    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour"))
    )
    inner = c.join(p, cond).collect()
    want_matched = {(r.p_user, r.purchase_id, r.click_id) for r in inner}
    assert got_matched == want_matched and len(want_matched) > 0

    matched_p = {pid for _, pid, _ in want_matched}
    matched_c = {cid for _, _, cid in want_matched}
    want_null_click = {r.purchase_id for r in p.collect()} - matched_p
    want_null_purch = {r.click_id for r in c.collect()} - matched_c
    # soundness: every NULL row is genuinely unmatched in batch truth
    assert got_null_click <= want_null_click
    assert got_null_purch <= want_null_purch
    # completeness where the watermark provably passed: first-file rows
    # are far below the final applied watermark on both sides
    first_file = spark.read.json(
        in_dir + "/part0.json",
        schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    first_p = {
        r.event_id
        for r in first_file.filter(F.col("event_type") == "purchase").collect()
    }
    first_c = {
        r.event_id
        for r in first_file.filter(F.col("event_type") == "click").collect()
    }
    assert (want_null_click & first_p) <= got_null_click
    assert (want_null_purch & first_c) <= got_null_purch
    assert got_null_click and got_null_purch


def test_streaming_cms_merged_equals_batch_sketch(spark, tmp_path):
    """CMS cells are additive, so the merged per-batch sketches must be
    BITWISE-equal to a one-shot batch sketch of the same rows — and the
    estimates served from stream state must match batch estimates."""
    from dimagi_data_platform_spark.operators.sketches import cms_build, cms_estimate
    from dimagi_data_platform_spark.streaming.cms_stream import (
        estimate_from_stream_state,
        merged_cms,
        run_streaming_cms,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    state = str(tmp_path / "cms_state")
    run_streaming_cms(
        stream,
        key="event_type",
        state_dir=state,
        checkpoint_dir=str(tmp_path / "cms_ckpt"),
        width=256,
        depth=3,
    )
    batch_sketch = {
        (r.row_id, r.bucket): r.cnt
        for r in cms_build(ev, "event_type", width=256, depth=3).collect()
    }
    merged = {
        (r.row_id, r.bucket): r.cnt for r in merged_cms(spark, state).collect()
    }
    assert merged == batch_sketch
    probe = ev.select("event_type").distinct()
    want = {
        r.event_type: r.est_count
        for r in cms_estimate(
            cms_build(ev, "event_type", width=256, depth=3),
            probe,
            "event_type",
            width=256,
            depth=3,
        ).collect()
    }
    got = {
        r.event_type: r.est_count
        for r in estimate_from_stream_state(
            spark, state, probe, "event_type", width=256, depth=3
        ).collect()
    }
    assert got == want


def test_streaming_cms_replay_idempotent(spark, tmp_path):
    """Re-writing a batch's cell partition (the failure-replay path)
    must leave the merged sketch unchanged — overwrite-by-batch_id
    never double-counts."""
    from dimagi_data_platform_spark.operators.sketches import cms_build
    from dimagi_data_platform_spark.streaming.cms_stream import (
        merged_cms,
        run_streaming_cms,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=2)
    state = str(tmp_path / "cms2_state")
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    run_streaming_cms(
        stream,
        key="event_type",
        state_dir=state,
        checkpoint_dir=str(tmp_path / "cms2_ckpt"),
        width=128,
        depth=3,
    )
    before = {
        (r.row_id, r.bucket): r.cnt for r in merged_cms(spark, state).collect()
    }
    batch0 = spark.read.json(
        in_dir + "/part0.json",
        schema="event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    cms_build(batch0, "event_type", width=128, depth=3).write.mode(
        "overwrite"
    ).parquet(f"{state}/cells/batch_id=0")
    after = {
        (r.row_id, r.bucket): r.cnt for r in merged_cms(spark, state).collect()
    }
    assert before == after


def test_streaming_versioned_sink_exactly_once_and_batch_twin(spark, tmp_path):
    """Micro-batches commit as versions; replayed batch ids are skipped;
    the final table equals the batch one-shot latest-wins twin."""
    import json as _json

    from dimagi_data_platform_spark.sources.stream import StreamSource, open_stream
    from dimagi_data_platform_spark.sources.versioned import history, read_version
    from dimagi_data_platform_spark.streaming.versioned_stream import (
        run_stream_to_versioned,
        versioned_sink,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    rows1 = [
        {"id": 1, "ver": 1, "who": "b1", "ts": "2024-01-01T00:00:01"},
        {"id": 2, "ver": 1, "who": "b1", "ts": "2024-01-01T00:00:02"},
    ]
    rows2 = [
        {"id": 1, "ver": 2, "who": "b2", "ts": "2024-01-02T00:00:01"},
        {"id": 3, "ver": 1, "who": "b2", "ts": "2024-01-02T00:00:02"},
    ]
    (indir / "a.json").write_text("\n".join(_json.dumps(r) for r in rows1))
    (indir / "b.json").write_text("\n".join(_json.dumps(r) for r in rows2))
    schema = "id long, ver long, who string, ts string"
    stream = open_stream(
        spark,
        StreamSource(kind="file", schema=schema, path=str(indir),
                     max_files_per_trigger=1),
    )
    tbl = str(tmp_path / "tbl")
    run_stream_to_versioned(
        stream, tbl, str(tmp_path / "ck"), keys=["id"], order_col="ver"
    )
    got = {r.id: r.who for r in read_version(spark, tbl).collect()}
    assert got == {1: "b2", 2: "b1", 3: "b2"}
    hist = history(tbl)
    assert len(hist) == 2 and [h["batch_id"] for h in hist] == [0, 1]
    # time travel in event time: as of Jan 1 only batch 1 is visible
    from dimagi_data_platform_spark.sources.versioned import read_asof

    old = {r.id: r.who for r in read_asof(spark, tbl, "2024-01-01T23:59:59").collect()}
    assert old == {1: "b1", 2: "b1"}
    # exactly-once: replaying an already-committed batch id is a no-op
    replay = spark.createDataFrame(
        [(9, 9, "dup", "2024-03-01T00:00:00")], schema
    )
    versioned_sink(tbl, keys=["id"], order_col="ver")(replay, 1)
    assert len(history(tbl)) == 2
    assert {r.id for r in read_version(spark, tbl).collect()} == {1, 2, 3}


def _crash_stream_fixture(spark, tmp_path):
    """Two single-file micro-batches feeding the versioned sink."""
    import json as _json

    from dimagi_data_platform_spark.sources.stream import StreamSource, open_stream

    indir = tmp_path / "in"
    indir.mkdir(exist_ok=True)
    rows1 = [
        {"id": 1, "ver": 1, "who": "b1", "ts": "2024-01-01T00:00:01"},
        {"id": 2, "ver": 1, "who": "b1", "ts": "2024-01-01T00:00:02"},
    ]
    rows2 = [
        {"id": 1, "ver": 2, "who": "b2", "ts": "2024-01-02T00:00:01"},
        {"id": 3, "ver": 1, "who": "b2", "ts": "2024-01-02T00:00:02"},
    ]
    (indir / "a.json").write_text("\n".join(_json.dumps(r) for r in rows1))
    (indir / "b.json").write_text("\n".join(_json.dumps(r) for r in rows2))
    schema = "id long, ver long, who string, ts string"

    def mk_stream():
        return open_stream(
            spark,
            StreamSource(kind="file", schema=schema, path=str(indir),
                         max_files_per_trigger=1),
        )

    return mk_stream


def _run_expect_crash(mk_stream, tbl, ck):
    import pytest as _pytest

    from dimagi_data_platform_spark.streaming.versioned_stream import (
        run_stream_to_versioned,
    )

    with _pytest.raises(Exception, match="injected crash"):
        run_stream_to_versioned(
            mk_stream(), tbl, ck, keys=["id"], order_col="ver"
        )


def _assert_final_state(spark, tbl):
    from dimagi_data_platform_spark.sources.versioned import history, read_version

    got = {r.id: r.who for r in read_version(spark, tbl).collect()}
    assert got == {1: "b2", 2: "b1", 3: "b2"}, got
    hist = history(tbl)
    assert [h["version"] for h in hist] == [1, 2], hist
    assert [h["batch_id"] for h in hist] == [0, 1], hist


def test_versioned_sink_crash_before_manifest_swap_replays_cleanly(
    spark, tmp_path, monkeypatch
):
    """Kill the sink BETWEEN the parquet data write and the atomic
    manifest swap on batch 1, restart the stream from the same
    checkpoint: the batch must replay against the pre-crash table, the
    half-written v=2 directory must be overwritten by the repair path,
    and the final table must equal the no-crash run — no duplicate
    version, no lost rows (r5 VERDICT item 6)."""
    import os as _os

    from dimagi_data_platform_spark.sources import versioned as V
    from dimagi_data_platform_spark.streaming.versioned_stream import (
        run_stream_to_versioned,
    )

    mk_stream = _crash_stream_fixture(spark, tmp_path)
    tbl, ck = str(tmp_path / "tbl"), str(tmp_path / "ck")

    real_commit = V._commit
    calls = {"n": 0}

    def crashing_commit(path, entry):
        calls["n"] += 1
        if calls["n"] == 2:  # batch 1's commit: data written, swap never runs
            raise RuntimeError("injected crash before manifest swap")
        real_commit(path, entry)

    monkeypatch.setattr(V, "_commit", crashing_commit)
    _run_expect_crash(mk_stream, tbl, ck)
    # post-crash state: batch 0 committed, batch 1's data sits in an
    # unreferenced staged dir the commit log doesn't know about (OCC
    # layout: data stages uniquely, the commit-log link is the swap)
    assert [h["batch_id"] for h in V.history(tbl)] == [0]
    referenced = {h.get("dir") for h in V.history(tbl)}
    orphans = [
        d
        for d in _os.listdir(tbl)
        if d.startswith(V.STAGE_PREFIX) and d not in referenced
    ]
    assert orphans, "crashed batch should leave an unreferenced staged dir"
    monkeypatch.setattr(V, "_commit", real_commit)
    # restart from the same checkpoint: batch 1 is redelivered
    run_stream_to_versioned(mk_stream(), tbl, ck, keys=["id"], order_col="ver")
    _assert_final_state(spark, tbl)


def test_versioned_sink_crash_after_manifest_swap_skips_replay(
    spark, tmp_path, monkeypatch
):
    """Kill the sink JUST AFTER batch 1's atomic swap (commit durable,
    foreachBatch never returned, so the checkpoint doesn't know):
    restart must detect the recorded batch id and SKIP the replay —
    exactly-once table state with no duplicate version entry."""
    from dimagi_data_platform_spark.sources import versioned as V
    from dimagi_data_platform_spark.streaming.versioned_stream import (
        run_stream_to_versioned,
    )

    mk_stream = _crash_stream_fixture(spark, tmp_path)
    tbl, ck = str(tmp_path / "tbl"), str(tmp_path / "ck")

    real_commit = V._commit
    calls = {"n": 0}

    def crash_after_commit(path, entry):
        calls["n"] += 1
        real_commit(path, entry)
        if calls["n"] == 2:
            raise RuntimeError("injected crash after manifest swap")

    monkeypatch.setattr(V, "_commit", crash_after_commit)
    _run_expect_crash(mk_stream, tbl, ck)
    # the commit IS durable: both batch ids recorded despite the crash
    assert [h["batch_id"] for h in V.history(tbl)] == [0, 1]
    monkeypatch.setattr(V, "_commit", real_commit)
    run_stream_to_versioned(mk_stream(), tbl, ck, keys=["id"], order_col="ver")
    _assert_final_state(spark, tbl)


def test_streaming_kmv_merged_equals_batch_sketch(spark, tmp_path):
    """KMV merge is associative + idempotent hash-set union, so the
    merged per-batch partials must be BITWISE-equal to a one-shot
    batch sketch of the same rows — and so must the estimates."""
    from dimagi_data_platform_spark.operators.sketches import (
        kmv_estimate,
        kmv_partial,
    )
    from dimagi_data_platform_spark.streaming.kmv_stream import (
        estimate_from_stream_state,
        merged_kmv,
        run_streaming_kmv,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    state = str(tmp_path / "kmv_state")
    run_streaming_kmv(
        stream,
        key="user_id",
        group_cols=["event_type"],
        state_dir=state,
        checkpoint_dir=str(tmp_path / "kmv_ckpt"),
        k=16,
    )
    batch = {
        (r.event_type, r.h)
        for r in kmv_partial(ev, "user_id", ["event_type"], 16).collect()
    }
    merged = {
        (r.event_type, r.h)
        for r in merged_kmv(spark, state, ["event_type"], 16).collect()
    }
    assert merged == batch
    want = {
        r.event_type: r.approx_distinct
        for r in kmv_estimate(
            kmv_partial(ev, "user_id", ["event_type"], 16), ["event_type"], 16
        ).collect()
    }
    got = {
        r.event_type: r.approx_distinct
        for r in estimate_from_stream_state(
            spark, state, ["event_type"], 16
        ).collect()
    }
    assert got == want
    # sanity: estimates land near the exact distincts (k=16 → ~25% rse)
    exact = {
        r.event_type: r.d
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for t, est in got.items():
        assert abs(est - exact[t]) / exact[t] < 0.75


def test_streaming_kmv_replay_idempotent(spark, tmp_path):
    """Re-running the stream over the same input (fresh checkpoint,
    same state dir) rewrites the same batch partitions — the merged
    sketch must not change."""
    from dimagi_data_platform_spark.streaming.kmv_stream import (
        merged_kmv,
        run_streaming_kmv,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=2)
    state = str(tmp_path / "kmv_state")
    for attempt in range(2):
        stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
        run_streaming_kmv(
            stream,
            key="user_id",
            group_cols=["event_type"],
            state_dir=state,
            checkpoint_dir=str(tmp_path / f"ckpt{attempt}"),
            k=16,
        )
    merged = merged_kmv(spark, state, ["event_type"], 16)
    assert merged.groupBy("event_type").count().filter("count > 16").count() == 0


def test_state_metrics_interval_join_eviction_schedule(spark, tmp_path):
    """State-store metrics surface (r7 verdict item 8): the
    stream-stream join's per-batch rows-in-state / evictions come back
    as a queryable DataFrame, evictions only happen when the watermark
    advances, and the state-size recurrence
    total_k = total_{k-1} + updated_k - removed_k holds exactly."""
    from dimagi_data_platform_spark.streaming.events_stream import (
        streaming_interval_join,
    )
    from dimagi_data_platform_spark.streaming.state_metrics import (
        run_to_sink_with_metrics,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    clicks_s = read_event_stream(spark, in_dir, fmt="json", max_files=1).filter(
        F.col("event_type") == "click"
    )
    purch_s = read_event_stream(spark, in_dir, fmt="json", max_files=1).filter(
        F.col("event_type") == "purchase"
    )
    metrics = run_to_sink_with_metrics(
        streaming_interval_join(clicks_s, purch_s),
        str(tmp_path / "smj_out"),
        str(tmp_path / "smj_ckpt"),
    )
    rows = metrics.orderBy("batch_id", "operator_idx").collect()
    assert len({r.batch_id for r in rows}) >= 3  # one per drained file
    assert {r.operator_name for r in rows} == {"symmetricHashJoin"}

    prev_total, prev_wm, evicted = 0, None, 0
    for r in rows:
        assert r.rows_total == prev_total + r.rows_updated - r.rows_removed
        if r.rows_removed > 0:
            # evictions are watermark-driven: the batch must have run
            # with a watermark strictly past the previous batch's
            assert prev_wm is None or r.watermark > prev_wm
            evicted += r.rows_removed
        prev_total, prev_wm = r.rows_total, r.watermark
    # event times span far beyond the join window, so the drain MUST
    # have evicted state — a stalled watermark here is the exact
    # production failure this surface exists to catch
    assert evicted > 0
    # watermark column is parsed and non-decreasing across batches
    wms = [r.watermark for r in rows if r.watermark is not None]
    assert wms == sorted(wms) and len(wms) >= 2


def test_state_metrics_dedup_eviction(spark, tmp_path):
    """The ingestion-dedup twin exposes its key-state metrics through
    the same surface: state grows with new keys and the watermark
    evicts old ones by the same recurrence."""
    from dimagi_data_platform_spark.streaming.events_stream import streaming_dedup
    from dimagi_data_platform_spark.streaming.state_metrics import (
        run_to_sink_with_metrics,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=3)
    stream = read_event_stream(spark, in_dir, fmt="json", max_files=1)
    metrics = run_to_sink_with_metrics(
        streaming_dedup(stream, watermark="2 hours"),
        str(tmp_path / "dd_out"),
        str(tmp_path / "dd_ckpt"),
    )
    rows = metrics.orderBy("batch_id").collect()
    assert rows and all("dedupe" in r.operator_name for r in rows)
    for prev, cur in zip([None] + rows[:-1], rows):
        before = prev.rows_total if prev else 0
        assert cur.rows_total == before + cur.rows_updated - cur.rows_removed
    assert sum(r.rows_removed for r in rows) > 0


def test_metrics_listener_persists_state_history(spark, tmp_path):
    """The always-on listener writes every progress's state rows to
    parquet; reading the sink back reproduces the recentProgress-based
    metrics for the drained query."""
    from dimagi_data_platform_spark.streaming.events_stream import streaming_dedup
    from dimagi_data_platform_spark.streaming.state_metrics import (
        MetricsToParquetListener,
        read_metrics,
        run_to_sink_with_metrics,
    )

    in_dir, ev = _dump_events_as_json(spark, tmp_path, n_files=2)
    sink = str(tmp_path / "metrics_sink")
    lst = MetricsToParquetListener(spark, sink).attach()
    try:
        direct = run_to_sink_with_metrics(
            streaming_dedup(read_event_stream(spark, in_dir, fmt="json", max_files=1)),
            str(tmp_path / "ml_out"),
            str(tmp_path / "ml_ckpt"),
        )
        # listener delivery is async; queries are done but events may
        # still be in flight — poll briefly for the sink to catch up
        import time as _time

        want = {
            (r.batch_id, r.operator_idx, r.rows_total, r.rows_removed)
            for r in direct.collect()
        }
        got = set()
        for _ in range(40):
            try:
                got = {
                    (r.batch_id, r.operator_idx, r.rows_total, r.rows_removed)
                    for r in read_metrics(spark, sink).collect()
                }
            except Exception:
                got = set()
            if want <= got:
                break
            _time.sleep(0.5)
        assert want <= got and want
    finally:
        lst.detach()


def test_versioned_sink_dv_mode_physical_and_cow_equivalence(spark, tmp_path):
    """VERDICT r9 item 2: the sink's default DV mode commits each
    micro-batch as merge-on-read sidecars (per-batch bytes scale with
    the BATCH, not the table), the cow flag preserves the old physical
    layout, and both modes produce the IDENTICAL logical table."""
    import os as _os

    from dimagi_data_platform_spark.sources import versioned as V
    from dimagi_data_platform_spark.streaming.versioned_stream import (
        run_stream_to_versioned,
    )

    mk_stream = _crash_stream_fixture(spark, tmp_path)
    dv_tbl, cow_tbl = str(tmp_path / "dv_tbl"), str(tmp_path / "cow_tbl")
    run_stream_to_versioned(
        mk_stream(), dv_tbl, str(tmp_path / "ck_dv"),
        keys=["id"], order_col="ver",
    )
    run_stream_to_versioned(
        mk_stream(), cow_tbl, str(tmp_path / "ck_cow"),
        keys=["id"], order_col="ver", merge_mode="cow",
    )
    want = {1: "b2", 2: "b1", 3: "b2"}
    for tbl in (dv_tbl, cow_tbl):
        got = {r.id: r.who for r in V.read_version(spark, tbl).collect()}
        assert got == want, tbl
        assert [h["batch_id"] for h in V.history(tbl)] == [0, 1]
    # physical: batch 1's DV commit holds ONLY sidecars; the COW commit
    # is a full snapshot rewrite
    dv_e, cow_e = V.history(dv_tbl)[-1], V.history(cow_tbl)[-1]
    assert dv_e.get("dv") is True and dv_e.get("dv_depth") == 1
    assert not cow_e.get("dv")
    d = V._data_dir(dv_tbl, dv_e)
    assert sorted(x for x in _os.listdir(d) if not x.startswith(".")) == [
        "delta", "dv",
    ]
    # exactly-once is mode-independent: replaying batch 1 is a no-op
    from dimagi_data_platform_spark.streaming.versioned_stream import (
        versioned_sink,
    )

    replay = spark.createDataFrame(
        [(9, 9, "dup", "2024-03-01T00:00:00")],
        "id long, ver long, who string, ts string",
    )
    versioned_sink(dv_tbl, keys=["id"], order_col="ver")(replay, 1)
    assert len(V.history(dv_tbl)) == 2
    assert {r.id for r in V.read_version(spark, dv_tbl).collect()} == {1, 2, 3}


def test_streaming_ingest_embed_dedup_grows_index_across_batches(spark, tmp_path):
    """P27b (vector sibling of P27): batch 1 drops its in-batch
    near-identical twin; batch 2's twin of a batch-1 SURVIVOR is
    dropped by the grid-index probe; distinct vectors pass. The index
    then holds exactly the survivors' features, and drops happened
    only on verified exact cosine — never on grid adjacency alone."""
    import numpy as np

    from dimagi_data_platform_spark.streaming.ingest_embed_dedup import (
        run_ingest_embed_dedup,
    )

    rng = np.random.RandomState(11)
    base = rng.rand(64).astype("float32")
    other = rng.rand(64).astype("float32")
    third = rng.rand(64).astype("float32")

    def rows(pairs):
        return [
            (int(i), [float(x) for x in v]) for i, v in pairs
        ]

    in_dir = tmp_path / "embin"
    in_dir.mkdir()

    def write_file(name, pairs):
        with open(in_dir / name, "w") as f:
            for vid, v in rows(pairs):
                f.write(json.dumps({"vec_id": vid, "embedding": v}) + "\n")

    # batch 1: 2 is a scaled twin of 1 (cosine exactly ~1, dropped
    # in-batch); 3 is independent
    write_file("b1.json", [(1, base), (2, base * 1.000001), (3, other)])
    # batch 2: 4 twins survivor 1 (dropped via the persisted index),
    # 5 is fresh
    write_file("b2.json", [(4, base * 0.999999), (5, third)])

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    index, out, ckpt = (
        str(tmp_path / "proj_idx"),
        str(tmp_path / "vec_out"),
        str(tmp_path / "emb_ckpt"),
    )
    run_ingest_embed_dedup(stream, index, out, ckpt, threshold=0.99)

    kept = {r.vec_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 3, 5}
    indexed = {r.id for r in spark.read.parquet(index).collect()}
    assert indexed == {1, 3, 5}
    # independent uniform vectors can share a sign bucket but never
    # cross the exact cosine gate at 0.99 — both survived, proving
    # drops require the verified kernel, not mere bucket collision


def test_ingest_embed_dedup_bucket_bits_mismatch_fails_loudly(spark, tmp_path):
    """An index probed at a different bucket_bits silently matches
    NOTHING (disjoint bucket values) — the sidecar guard must turn
    that into a loud error instead of waving duplicates through."""
    import numpy as np
    import pytest

    from dimagi_data_platform_spark.streaming.ingest_embed_dedup import (
        ingest_batch_embed_dedup,
    )

    rng = np.random.RandomState(5)
    batch = spark.createDataFrame(
        [(1, [float(x) for x in rng.rand(64)])],
        "vec_id long, embedding array<float>",
    )
    index, out = str(tmp_path / "idx"), str(tmp_path / "out")
    ingest_batch_embed_dedup(spark, batch, 0, index, out, bucket_bits=16)
    with pytest.raises(ValueError, match="bucket_bits=16"):
        ingest_batch_embed_dedup(spark, batch, 1, index, out, bucket_bits=8)


def test_seed_embed_dedup_index_writes_sidecar_and_guards(spark, tmp_path):
    """An externally seeded index must carry the _bits.json sidecar so
    a mismatched probe fails loudly — without the seed helper, the
    first probe would stamp its OWN bucket_bits over a pre-existing
    parquet index and silently accept a seed/probe mismatch (the exact
    match-nothing failure the guard exists to prevent)."""
    import numpy as np
    import pytest

    from dimagi_data_platform_spark.streaming.ingest_embed_dedup import (
        ingest_batch_embed_dedup,
        seed_embed_dedup_index,
    )

    rng = np.random.RandomState(9)
    base = [float(x) for x in rng.rand(64)]
    corpus = spark.createDataFrame(
        [(1, base)], "vec_id long, embedding array<float>"
    )
    index, out = str(tmp_path / "idx"), str(tmp_path / "out")
    seed_embed_dedup_index(corpus, index, bucket_bits=16)
    # probe at a different width: loud, not silent
    probe = spark.createDataFrame(
        [(10, base)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="bucket_bits=16"):
        ingest_batch_embed_dedup(spark, probe, 1, index, out, bucket_bits=8)
    # probe at the seeded width: the seeded twin is caught
    ingest_batch_embed_dedup(spark, probe, 1, index, out, bucket_bits=16)
    assert spark.read.parquet(out).count() == 0  # dup of seeded row 1


def test_ingest_embed_dedup_shuffle_fallback_above_broadcast_limit(
    spark, tmp_path, monkeypatch
):
    """Above BROADCAST_ROW_LIMIT batch rows the probe must drop the
    broadcast hint (an availableNow backfill can arrive as ONE giant
    batch that exceeds broadcast limits) and still produce identical
    results through the shuffle join."""
    import numpy as np

    from dimagi_data_platform_spark.streaming import ingest_embed_dedup as mod

    rng = np.random.RandomState(3)
    base = rng.rand(64)
    rows = [(1, [float(x) for x in base])] + [
        (int(i), [float(x) for x in rng.rand(64)]) for i in range(2, 8)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    index, out = str(tmp_path / "idx"), str(tmp_path / "out")
    mod.seed_embed_dedup_index(corpus, index, bucket_bits=16)
    # force every batch over the limit so the shuffle path runs
    monkeypatch.setattr(mod, "BROADCAST_ROW_LIMIT", 0)
    probe = spark.createDataFrame(
        [
            (10, [float(x) for x in base * 1.000001]),  # dup of seeded 1
            (11, [float(x) for x in rng.rand(64)]),  # fresh
            (12, [float(x) for x in rng.rand(64)]),  # fresh
        ],
        "vec_id long, embedding array<float>",
    )
    mod.ingest_batch_embed_dedup(spark, probe, 1, index, out, bucket_bits=16)
    kept = {r.vec_id for r in spark.read.parquet(out).collect()}
    assert kept == {11, 12}


def test_project_features_rejects_overflowing_bucket_bits(spark):
    """bucket_bits >= 63 would shift into/past the int64 sign bit —
    silent platform-dependent buckets at exactly the >=2^31-bucket
    scale the knob targets. The featurizer must refuse."""
    import pytest

    from dimagi_data_platform_spark.operators.similarity import (
        project_features,
    )

    df = spark.createDataFrame(
        [(1, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="bucket_bits=63"):
        project_features(df, bucket_bits=63)
    with pytest.raises(ValueError, match="bucket_bits=0"):
        project_features(df, bucket_bits=0)


def test_project_features_wide_buckets_are_int64_clean(spark):
    """At bucket_bits=34 (the ~10^10-vector recommendation) bucket
    values must be exact int64 bit patterns — non-negative, within
    2^34, and stable across two runs (no overflow nondeterminism)."""
    import numpy as np

    from dimagi_data_platform_spark.operators.similarity import (
        project_features,
    )

    rng = np.random.RandomState(21)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.rand(64)]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    f1 = project_features(df, bucket_bits=34).select("id", "b0", "b7")
    rows1 = {r.id: (r.b0, r.b7) for r in f1.collect()}
    rows2 = {
        r.id: (r.b0, r.b7)
        for r in project_features(df, bucket_bits=34)
        .select("id", "b0", "b7")
        .collect()
    }
    assert rows1 == rows2
    for b0, b7 in rows1.values():
        assert 0 <= b0 < (1 << 34) and 0 <= b7 < (1 << 34)


def test_kafka_open_stream_drains_typed_rows_via_fake_broker(spark, tmp_path):
    """P57 contract test against the injected fake broker (P58
    discipline): open_stream(kind='kafka') builds the production
    reader+parse path verbatim — only the format points at the
    fake_kafka Python data source, which serves the IDENTICAL wire
    frame and refuses to load unless the full Kafka option map
    arrived. Drains typed rows incl. malformed->NULL and the broker
    timestamp; a second drain from the same checkpoint reprocesses
    nothing (offset contract)."""
    import json as _json

    from dimagi_data_platform_spark.sources.fake_kafka import (
        FakeKafkaDataSource,
    )
    from dimagi_data_platform_spark.sources.stream import (
        StreamSource,
        open_stream,
    )

    spark.dataSource.register(FakeKafkaDataSource)
    log = tmp_path / "broker"
    log.mkdir()
    (log / "seg-0.json").write_text(
        _json.dumps(
            [
                {"key": "a", "value": '{"id": 1, "name": "x"}', "ts_ms": 1000},
                {"key": None, "value": "not json at all", "ts_ms": 2000},
            ]
        )
    )
    (log / "seg-1.json").write_text(
        _json.dumps(
            [{"key": "b", "value": '{"id": 2, "name": "y"}', "ts_ms": 3000}]
        )
    )
    src = StreamSource(
        kind="kafka",
        schema="id INT, name STRING",
        bootstrap_servers="broker-1:9092",
        topic="events",
        kafka_format="fake_kafka",
        options={"fake.broker.log": str(log)},
    )
    stream = open_stream(spark, src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3
    by_id = {r.id: r for r in rows}
    assert by_id[1].name == "x" and by_id[2].name == "y"
    # malformed value -> NULL row, never a crash
    assert None in by_id and by_id[None].name is None
    assert all(r.kafka_ts is not None for r in rows)
    # same checkpoint, no new segments: nothing reprocessed
    drain()
    assert spark.read.parquet(out).count() == 3
    # a third segment published later IS picked up from the cursor
    (log / "seg-2.json").write_text(
        _json.dumps(
            [{"key": "c", "value": '{"id": 3, "name": "z"}', "ts_ms": 4000}]
        )
    )
    drain()
    assert spark.read.parquet(out).count() == 4


def test_fake_kafka_enforces_option_contract(spark, tmp_path):
    """The double must refuse to run when open_stream fails to deliver
    the Kafka option map — that's what upgrades the drain test from
    'rows flowed' to 'the option contract held'."""
    import pytest

    from dimagi_data_platform_spark.sources.fake_kafka import (
        FakeKafkaStreamReader,
    )

    with pytest.raises(ValueError, match="bootstrap"):
        FakeKafkaStreamReader({"subscribe": "t", "fake.broker.log": "/x"})
    with pytest.raises(ValueError, match="subscribe"):
        FakeKafkaStreamReader(
            {"kafka.bootstrap.servers": "b:9092", "fake.broker.log": "/x"}
        )
    with pytest.raises(ValueError, match="fake.broker.log"):
        FakeKafkaStreamReader(
            {"kafka.bootstrap.servers": "b:9092", "subscribe": "t"}
        )

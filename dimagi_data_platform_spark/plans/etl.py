"""Composed platform ETL — the reference's end-to-end job (P57 shape):
ingest → normalize → indicators → serve, as ONE config-driven driver.

The reference platform ran commcare-export ingestion, form/visit
normalization, monthly indicator builds, and a Postgres publish as a
single scheduled pipeline. ``run_platform_etl`` chains the Spark-first
equivalents that already exist as graded components:

  P8  incremental watermark ingest   (sources/incremental.py)
  P62 versioned staging MERGE        (sources/versioned.py, latest-wins
                                      by event_id — resubmission dedup)
  P1  latest event per user          (operators/dedup.latest_by_key)
  P2  visit sessionization           (operators/sessionize.sessionize)
  P3  monthly usage indicators
  P9  JDBC staging + server-side MERGE upsert (sources/jdbc.py)

Crash-safety contract (the at-least-once discipline of P8): the
watermark advances ONLY after every downstream write has succeeded, so
a crash anywhere re-processes the same batch on resume — and every
write in the chain is CONVERGENT under re-processing:

  - staging: copy-on-write MERGE, latest-wins on (event_id, ts) — a
    replayed batch rewrites the same rows to the same values;
  - indicator tables: versioned MERGE keyed on the indicator grain,
    ordered by the batch watermark stamp (a replay carries the same
    stamp; ties resolve update-wins to the identical row);
  - warehouse publish: ANSI MERGE upsert keyed on the grain.

So `run(); crash; run()` converges to the byte-identical warehouse
state of a never-crashed run — proven by tests/test_platform_etl.py,
which kills the driver between stages and diffs final state.

Scale posture: per-batch work is proportional to the TOUCHED USERS'
history, not the corpus — indicators recompute only for users present
in the incoming batch (one semi-join against the staged table; session
boundaries and monthly aggregates of untouched users cannot change),
and the versioned MERGE + JDBC MERGE update only those grains. The
staging merge is the standard key-shuffled copy-on-write cost.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dimagi_data_platform_spark.functions.num import dsum
from dimagi_data_platform_spark.operators.dedup import latest_by_key
from dimagi_data_platform_spark.operators.sessionize import sessionize
from dimagi_data_platform_spark.sources.incremental import (
    WatermarkStore,
    incremental_read,
)
from dimagi_data_platform_spark.sources.jdbc import (
    JdbcConfig,
    merge_sql,
    write_jdbc,
)
from dimagi_data_platform_spark.sources.versioned import (
    history,
    merge_version,
    read_version,
    write_version,
)


@dataclass
class PlatformEtlConfig:
    """Declarative pipeline config — the single entrypoint surface.

    ``jdbc_url``/``jdbc_driver`` point the publish stage at a live
    warehouse (embedded Derby in tests, Postgres in production — the
    same dialect-portable MERGE). ``publish`` lists which indicator
    tables to serve. ``fail_after`` is the crash-injection seam used
    by the convergence test; production callers leave it None."""

    source_events: str
    warehouse: str
    jdbc_url: str | None = None
    jdbc_driver: str = "org.postgresql.Driver"
    publish: tuple[str, ...] = ("monthly_usage",)
    watermark_name: str = "events"
    fail_after: str | None = None


# indicator grain keys (also the MERGE keys, versioned and JDBC)
_INDICATOR_KEYS = {
    "latest_event": ["user_id"],
    "visits": ["user_id", "session_id"],
    "monthly_usage": ["user_id", "month"],
}


def _latest_event(ev: DataFrame) -> DataFrame:
    """P1 — mirrors the registered `latest_event_per_user` query."""
    return latest_by_key(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


def _visits(ev: DataFrame) -> DataFrame:
    """P2 — mirrors the registered `visits_sessionize` query."""
    s = sessionize(ev, "user_id", "ts", gap_seconds=1800, tie_break="event_id")
    dur = (
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).cast("double")
        / F.lit(1000000.0)
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dur.alias("duration_s"),
        dsum("value").alias("total_value"),
    )


def _monthly_usage(ev: DataFrame) -> DataFrame:
    """P3 — mirrors the registered `monthly_usage` query."""
    return ev.groupBy(
        "user_id", F.date_trunc("month", "ts").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.to_date("ts")).alias("active_days"),
        F.countDistinct("event_type").alias("n_event_types"),
        dsum("value").alias("total_value"),
        F.date_trunc("day", F.min("ts")).alias("first_day"),
        F.date_trunc("day", F.max("ts")).alias("last_day"),
    )


_INDICATORS = {
    "latest_event": _latest_event,
    "visits": _visits,
    "monthly_usage": _monthly_usage,
}


def _merge_or_init(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    commit_ts: str,
) -> int:
    if not history(path):
        return write_version(updates, path, commit_ts)
    return merge_version(spark, path, updates, keys, order_col, commit_ts)


def _maybe_fail(cfg: PlatformEtlConfig, stage: str) -> None:
    if cfg.fail_after == stage:
        raise RuntimeError(f"injected crash after stage {stage!r}")


def _publish_jdbc(
    spark: SparkSession,
    cfg: PlatformEtlConfig,
    name: str,
    rows: DataFrame,
    keys: list[str],
) -> int:
    """P9 publish: write the batch's indicator rows to a staging table,
    then one server-side ANSI MERGE into the target. Identifiers are
    uppercased (Derby/Postgres resolve unquoted MERGE references to
    upper/lower case respectively; Spark's writer quotes them as
    given, so uppercase round-trips on both)."""
    up = rows.select([F.col(c).alias(c.upper()) for c in rows.columns])
    target = name.upper()
    staging = f"{target}_STG"
    jcfg = lambda table: JdbcConfig(  # noqa: E731
        url=cfg.jdbc_url, table=table, driver=cfg.jdbc_driver
    )
    write_jdbc(up, jcfg(staging), mode="overwrite")
    # first publish: create the target as an empty copy of staging
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(cfg.jdbc_url)
    try:
        meta = conn.getMetaData()
        rs = meta.getTables(None, None, target, None)
        exists = rs.next()
        rs.close()
        st = conn.createStatement()
        try:
            if not exists:
                st.executeUpdate(
                    f"CREATE TABLE {target} AS SELECT * FROM {staging} "
                    f"WITH NO DATA"
                )
            n = st.executeUpdate(
                merge_sql(
                    target,
                    staging,
                    keys=[k.upper() for k in keys],
                    columns=[c.upper() for c in rows.columns],
                )
            )
        finally:
            st.close()
    finally:
        conn.close()
    return int(n)


def run_platform_etl(spark: SparkSession, cfg: PlatformEtlConfig) -> dict:
    """One incremental pipeline run; returns a report dict. Safe to
    re-run at any time: an empty batch is a no-op, a replayed batch
    converges (see module docstring)."""
    store = WatermarkStore(f"{cfg.warehouse}/watermark.json")
    wm_before = store.get(cfg.watermark_name)
    # same timestamp normalization as catalog.load_table: session tz
    # pinned UTC, NTZ columns cast to plain TIMESTAMP (unix_micros and
    # RANGE windows reject NTZ)
    from pyspark.sql.types import TimestampNTZType

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = spark.read.parquet(cfg.source_events)
    for field in events.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            events = events.withColumn(
                field.name, F.col(field.name).cast("timestamp")
            )
    batch = incremental_read(events, "ts", store, cfg.watermark_name)
    # the batch drives several stages — pin it once
    batch = batch.localCheckpoint()
    n_batch = batch.count()
    report = {
        "watermark_before": wm_before,
        "rows_ingested": n_batch,
        "stages": [],
    }
    if n_batch == 0:
        report["no_op"] = True
        return report
    new_wm = batch.agg(
        F.max(F.unix_micros(F.col("ts"))).alias("wm")
    ).collect()[0].wm
    commit_ts = (
        batch.agg(F.max("ts").cast("string").alias("m")).collect()[0].m
    )
    _maybe_fail(cfg, "ingest")

    # P62 staging MERGE: latest-wins resubmission dedup on event_id
    staging_path = f"{cfg.warehouse}/staging_events"
    v = _merge_or_init(
        spark, staging_path, batch, ["event_id"], "ts", commit_ts
    )
    report["stages"].append(("stage_merge", v))
    _maybe_fail(cfg, "stage_merge")

    # indicators recompute ONLY the touched users' grains, from the
    # full staged history of those users
    users = batch.select("user_id").distinct()
    staged = read_version(spark, staging_path)
    scoped = staged.join(F.broadcast(users), "user_id", "semi").localCheckpoint()
    wm_stamp = F.lit(int(new_wm)).cast("long").alias("_etl_wm")
    for name, fn in _INDICATORS.items():
        rows = fn(scoped).withColumn("_etl_wm", wm_stamp)
        iv = _merge_or_init(
            spark,
            f"{cfg.warehouse}/{name}",
            rows,
            _INDICATOR_KEYS[name],
            "_etl_wm",
            commit_ts,
        )
        report["stages"].append((f"indicator:{name}", iv))
    _maybe_fail(cfg, "indicators")

    if cfg.jdbc_url:
        for name in cfg.publish:
            rows = read_version(spark, f"{cfg.warehouse}/{name}").join(
                F.broadcast(users), "user_id", "semi"
            )
            n = _publish_jdbc(
                spark, cfg, name, rows.drop("_etl_wm"), _INDICATOR_KEYS[name]
            )
            report["stages"].append((f"publish:{name}", n))
    _maybe_fail(cfg, "publish")

    # the at-least-once commit point: everything downstream succeeded
    store.set(cfg.watermark_name, int(new_wm))
    report["watermark_after"] = int(new_wm)
    return report

"""Streaming anomaly detection — the streaming twin of the
daily_event_anomalies batch query (P35).

Shape: foreachBatch incremental maintenance. Each micro-batch
1. aggregates its rows to per-day count DELTAS,
2. writes them to an idempotent per-batch partition
   (``state_dir/deltas/batch_id=N``, overwrite — a replayed batch
   rewrites the same partition, so counts never double),
3. recomputes the z-score report over the merged daily table and
   overwrites the report output.

Step 3 is a wholesale recompute, which is correct here because the
daily table is METADATA-scale (one row per day) no matter how large
the event stream is — the same observation the batch query's plan
relies on. The z-score is the identical closed form
(n*x - sx) / sqrt(n*(n*sxx - sx²)/(n-1)) over exact integer moment
sums, so the final report is bitwise equal to the batch query on the
same events (pinned by the batch-equivalence test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def daily_anomaly_report(
    daily: DataFrame, baseline_days: int = 28, min_days: int = 14
) -> DataFrame:
    """(day, n_events, n_baseline_days, z_score, is_anomaly) — the
    shared trailing-z formula; ``daily`` must be (day, n_events)."""
    w = Window.orderBy("day").rowsBetween(-baseline_days, -1)
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("n_events").over(w)
    sxx = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    var_num = n * sxx - sx * sx
    num = (n * F.col("n_events") - sx).cast("double")
    den = F.sqrt((n * var_num).cast("double") / (n - F.lit(1)).cast("double"))
    z = F.when((n >= min_days) & (var_num > 0), num / den)
    return (
        daily.select(
            "day", "n_events", n.alias("n_baseline_days"), z.alias("z_score")
        )
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("z_score")) > F.lit(3.0), F.lit(False)),
        )
        .orderBy("day")
    )


def merged_daily_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """Sum the per-batch delta partitions into the daily-count table."""
    return (
        spark.read.parquet(f"{state_dir}/deltas")
        .groupBy("day")
        .agg(F.sum("n_delta").cast("long").alias("n_events"))
    )


def run_streaming_anomalies(
    stream: DataFrame,
    state_dir: str,
    report_dir: str,
    checkpoint_dir: str,
    baseline_days: int = 28,
    min_days: int = 14,
) -> None:
    """Drive the stream with availableNow micro-batches; leaves the
    current anomaly report as parquet at ``report_dir``."""
    spark = stream.sparkSession

    def handle(batch: DataFrame, batch_id: int) -> None:
        deltas = batch.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
            F.count(F.lit(1)).alias("n_delta")
        )
        # idempotent: a replayed batch rewrites its own partition
        deltas.write.mode("overwrite").parquet(
            f"{state_dir}/deltas/batch_id={batch_id}"
        )
        report = daily_anomaly_report(
            merged_daily_counts(spark, state_dir), baseline_days, min_days
        )
        report.write.mode("overwrite").parquet(report_dir)

    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

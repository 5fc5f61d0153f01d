"""Config-driven Structured Streaming sources.

Every streaming operator in this repo is source-agnostic (plain
DataFrame transformations); this module is the single place that turns
a declarative source config into the input stream, so pipelines swap
file → Kafka by editing CONFIG, not code — the deploy-time posture of
the reference's ingestion layer.

Supported kinds:
- ``file``: schema-enforced json/csv/parquet directory stream with
  ``maxFilesPerTrigger`` rate control (what every test in this repo
  drains with availableNow).
- ``rate``: Spark's built-in rate source (synthetic load/testing).
- ``kafka``: the production message-bus path. This container has no
  broker and no spark-sql-kafka connector jar, so the Kafka branch is
  CONFIG-ONLY here: the option mapping (bootstrap servers, topic
  subscription, starting offsets, failOnDataLoss) and the value-parse
  projection are unit-tested pure functions, and ``open_stream``
  raises a clear error before touching the network if the connector
  is absent. On a real cluster the identical config runs unchanged.

Kafka value parsing: records arrive as binary ``value``; with a
declared schema the stream projects ``from_json(CAST(value AS
STRING))`` into typed columns plus ``kafka_ts`` (broker append time)
— malformed records become NULL rows (count them, don't crash), the
same contract as the batch JSON readers in sources/files.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class StreamSource:
    """Declarative description of one streaming input."""

    kind: str  # "file" | "kafka" | "rate"
    schema: StructType | str | None = None
    # file kind
    path: str | None = None
    fmt: str = "json"
    max_files_per_trigger: int | None = 10
    # kafka kind
    bootstrap_servers: str | None = None
    topic: str | None = None
    starting_offsets: str = "earliest"
    fail_on_data_loss: bool = False
    # reader format for the kafka kind — the injected-transport seam
    # (P58 discipline): tests point it at the fake_kafka Python data
    # source, which serves the identical wire frame and enforces the
    # same option contract, so the production path below runs
    # unchanged end to end without a broker
    kafka_format: str = "kafka"
    # extra reader options (either kind), applied last
    options: dict = field(default_factory=dict)


def kafka_options(src: StreamSource) -> dict[str, str]:
    """The exact option map handed to the Kafka reader — a pure
    function so the config contract is testable without a broker."""
    if src.kind != "kafka":
        raise ValueError(f"not a kafka source: kind={src.kind!r}")
    if not src.bootstrap_servers or not src.topic:
        raise ValueError("kafka source needs bootstrap_servers and topic")
    opts = {
        "kafka.bootstrap.servers": src.bootstrap_servers,
        "subscribe": src.topic,
        "startingOffsets": src.starting_offsets,
        "failOnDataLoss": "true" if src.fail_on_data_loss else "false",
    }
    opts.update({k: str(v) for k, v in src.options.items()})
    return opts


def parse_kafka_value(raw: DataFrame, schema: StructType | str) -> DataFrame:
    """Project a raw Kafka frame (key/value/timestamp/...) into typed
    columns: from_json over the declared schema, NULL on malformed
    (never an executor crash), broker timestamp kept as ``kafka_ts``.
    Pure DataFrame function — unit-tested on a batch frame with the
    identical kafka wire schema."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("data"),
        F.col("timestamp").alias("kafka_ts"),
    ).select("data.*", "kafka_ts")


def open_stream(spark: SparkSession, src: StreamSource) -> DataFrame:
    """Build the input stream described by ``src``."""
    if src.kind == "file":
        if src.path is None or src.schema is None:
            raise ValueError("file stream needs path and an explicit schema")
        reader = spark.readStream.schema(src.schema).format(src.fmt)
        if src.max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", src.max_files_per_trigger
            )
        for k, v in src.options.items():
            reader = reader.option(k, v)
        return reader.load(src.path)
    if src.kind == "rate":
        reader = spark.readStream.format("rate")
        for k, v in src.options.items():
            reader = reader.option(k, v)
        return reader.load()
    if src.kind == "kafka":
        opts = kafka_options(src)
        try:
            reader = spark.readStream.format(src.kafka_format)
            for k, v in opts.items():
                reader = reader.option(k, v)
            raw = reader.load()
        except Exception as e:  # connector jar absent in this container
            raise RuntimeError(
                "Kafka source requires the spark-sql-kafka connector on "
                "the cluster classpath (--packages org.apache.spark:"
                "spark-sql-kafka-0-10_2.13:<spark version>); config was "
                f"valid: {sorted(opts)}"
            ) from e
        return parse_kafka_value(raw, src.schema) if src.schema else raw
    raise ValueError(f"unknown stream source kind: {src.kind!r}")

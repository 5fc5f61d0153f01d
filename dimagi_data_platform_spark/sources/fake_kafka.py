"""Fake Kafka broker as a PySpark 4 Python Data Source — the injected
transport for contract-testing :func:`sources.stream.open_stream`'s
Kafka read path in a container with no broker and no
spark-sql-kafka connector (the P58 injected-transport discipline:
the production code path runs unchanged, only the wire is a double).

The double emits the EXACT Kafka wire frame the real connector
produces::

    key binary, value binary, topic string, partition int,
    offset long, timestamp timestamp, timestampType int

so ``parse_kafka_value`` — the projection the production path applies —
runs against it verbatim. Records come from a broker-log fixture dir of
immutable segments (``seg-<n>.json``, each a JSON list of
``{"key": str|null, "value": str, "ts_ms": int}``); the segment cursor
is the stream offset, so replay is bitwise (the same recovery contract
as rest_stream_datasource).

The double also ENFORCES the option contract: it refuses to load
without ``kafka.bootstrap.servers`` and ``subscribe`` — a drained batch
therefore proves open_stream really delivered the full Kafka option
map to the reader, not just that some rows flowed.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

KAFKA_WIRE_DDL = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


class FakeKafkaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fake_kafka"

    def schema(self):
        return KAFKA_WIRE_DDL

    def simpleStreamReader(self, schema: StructType):
        return FakeKafkaStreamReader(self.options)


class FakeKafkaStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        # the contract check: the REAL reader needs these to reach a
        # broker, so the double refuses to run without them
        if not options.get("kafka.bootstrap.servers"):
            raise ValueError(
                "fake_kafka: kafka.bootstrap.servers option missing — "
                "open_stream did not deliver the Kafka option map"
            )
        topic = options.get("subscribe")
        if not topic:
            raise ValueError("fake_kafka: subscribe option missing")
        self.topic = topic
        self.log_dir = options.get("fake.broker.log")
        if not self.log_dir:
            raise ValueError("fake_kafka: fake.broker.log option required")
        # startingOffsets contract: 'earliest' (default) or a numeric
        # segment to start from (stands in for real offset JSON)
        so = options.get("startingoffsets", options.get("startingOffsets", "earliest"))
        self.start_seg = 0 if so == "earliest" else int(so)

    def initialOffset(self) -> dict:
        return {"seg": self.start_seg}

    def _n_segs(self) -> int:
        n = 0
        while os.path.exists(os.path.join(self.log_dir, f"seg-{n}.json")):
            n += 1
        return n

    def _rows(self, lo: int, hi: int):
        for seg in range(lo, hi):
            with open(os.path.join(self.log_dir, f"seg-{seg}.json")) as fh:
                recs = json.load(fh)
            for i, rec in enumerate(recs):
                key = rec.get("key")
                yield (
                    key.encode() if key is not None else None,
                    rec["value"].encode(),
                    self.topic,
                    0,
                    seg * 1_000_000 + i,
                    datetime.fromtimestamp(
                        rec["ts_ms"] / 1000.0, tz=timezone.utc
                    ).replace(tzinfo=None),
                    0,
                )

    def read(self, start: dict):
        lo = int(start["seg"])
        hi = self._n_segs()
        if hi <= lo:
            return iter([]), {"seg": lo}
        return iter(list(self._rows(lo, hi))), {"seg": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # segments are immutable: replay is bitwise the original batch
        return iter(list(self._rows(int(start["seg"]), int(end["seg"]))))

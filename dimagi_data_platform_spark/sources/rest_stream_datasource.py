"""Streaming paginated REST ingestion as a PySpark 4 Python Data
Source — the STRUCTURED-STREAMING sibling of
:mod:`sources.rest_datasource` (P58b): an append-only paginated feed
becomes a real ``readStream`` source with offset tracking, replay, and
exactly-once downstream semantics from the engine's checkpoint.

Shape: the feed exposes numbered pages (``page-<n>.json``); new pages
appear over time. ``SimpleDataSourceStreamReader`` tracks the page
cursor as the stream offset:

- ``initialOffset()``     → ``{"page": 0}`` (or ``start_page``).
- ``read(start)``         → all records in the pages that exist NOW
  beyond the cursor, plus the advanced offset. A partially-written
  page is left for the next batch (files are read atomically by
  name, so a page is either absent or complete).
- ``readBetweenOffsets()``→ deterministic REPLAY of [start, end) for
  recovery — pages are immutable once written, so re-reading the same
  range yields the same rows (the property the engine needs from a
  replayable source).

Per-batch page caps (``max_pages_per_batch``) bound batch size the way
``maxFilesPerTrigger`` does for file streams. Transport mirrors P58b:
``fixture_dir`` (page files, the no-network testing posture) or
``base_url`` with a ``{page}`` placeholder + ``n_pages_url`` endpoint
returning the current page count.

Scale: ``SimpleDataSourceStreamReader`` reads on the driver (right for
a cursor-bounded control-plane feed; the per-batch cap bounds memory).
For bulk backfill of a large already-published page range, use the
BATCH ``rest_pages`` source (P58b) whose fetches fan out across
executors, then switch the stream on from the cutover offset.

Usage::

    spark.dataSource.register(RestPagesStreamDataSource)
    df = (spark.readStream.format("rest_pages_stream")
          .option("schema_ddl", "id INT, name STRING")
          .option("fixture_dir", "/data/pages")
          .load())
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType


class RestPagesStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_pages_stream"

    def schema(self):
        ddl = self.options.get("schema_ddl")
        if not ddl:
            raise ValueError("rest_pages_stream requires option schema_ddl")
        return ddl

    def simpleStreamReader(self, schema: StructType):
        return RestPagesStreamReader(schema, self.options)


class RestPagesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.fields = [f.name for f in schema.fields]
        self.fixture_dir = options.get("fixture_dir")
        self.base_url = options.get("base_url")
        self.n_pages_url = options.get("n_pages_url")
        if not (self.fixture_dir or (self.base_url and self.n_pages_url)):
            raise ValueError(
                "rest_pages_stream requires fixture_dir or "
                "base_url + n_pages_url"
            )
        self.start_page = int(options.get("start_page", "0"))
        self.max_pages = int(options.get("max_pages_per_batch", "16"))
        self.max_retries = int(options.get("max_retries", "5"))
        self.backoff_base_s = float(options.get("backoff_base_s", "0.5"))

    # -- offset bookkeeping ------------------------------------------------
    def initialOffset(self) -> dict:
        return {"page": self.start_page}

    def _available_pages(self) -> int:
        """Current count of fully-published pages."""
        if self.fixture_dir:
            n = 0
            while os.path.exists(
                os.path.join(self.fixture_dir, f"page-{n}.json")
            ):
                n += 1
            return n
        # shared retrying transport (sources/rest.py) — same
        # exponential-backoff posture as the batch datasource: a flaky
        # page-count probe or page fetch backs off instead of failing
        # the micro-batch
        from dimagi_data_platform_spark.sources.rest import http_get_json

        body = http_get_json(
            self.n_pages_url,
            max_retries=self.max_retries,
            backoff_base_s=self.backoff_base_s,
        )
        return int(body["n_pages"])

    def _fetch(self, page: int) -> list[dict]:
        if self.fixture_dir:
            with open(
                os.path.join(self.fixture_dir, f"page-{page}.json")
            ) as fh:
                return json.load(fh)
        from dimagi_data_platform_spark.sources.rest import http_get_json

        return http_get_json(
            self.base_url.format(page=page),
            max_retries=self.max_retries,
            backoff_base_s=self.backoff_base_s,
        )

    def _rows(self, start: int, end: int):
        for page in range(start, end):
            for rec in self._fetch(page):
                yield tuple(rec.get(f) for f in self.fields)

    # -- engine contract ---------------------------------------------------
    def read(self, start: dict):
        lo = int(start["page"])
        hi = min(self._available_pages(), lo + self.max_pages)
        if hi <= lo:
            return iter([]), {"page": lo}
        # a LIST-backed iterator: the engine's prefetch cache copies the
        # batch (plain generators don't pickle) and the replay path
        # wants an iterator; bounded by the per-batch cap either way
        return iter(list(self._rows(lo, hi))), {"page": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # pages are immutable once published: the replay is bitwise the
        # original batch — the recovery contract
        return iter(list(self._rows(int(start["page"]), int(end["page"]))))

    def commit(self, end: dict) -> None:
        pass

"""Paginated REST ingestion as a PySpark 4 Python Data Source — the
DISTRIBUTED evolution of sources/rest.py (P58).

`sources/rest.py` drains a cursor-paginated API on the driver (the
commcare-export posture: correctness, checkpointed state). That is the
right shape for cursor pagination, where page N+1's address is only
known after reading page N. But for OFFSET/page-numbered APIs the page
address space is known up front, so fetches can fan out across the
cluster — this module packages exactly that as a
``pyspark.sql.datasource.DataSource`` (Spark 4's Python Data Source
API): ``partitions()`` carves the page range into ``InputPartition``s,
each ``read(partition)`` runs ON AN EXECUTOR, fetching only its pages.
At 10^6 pages this is the difference between one driver loop and a
cluster-wide ingest.

Transport: ``base_url`` option (``{page}`` placeholder) fetches over
HTTP via urllib; ``fixture_dir`` option reads ``page-<n>.json`` files
from a directory instead — the injected-transport testing posture of
sources/rest.py carried over (this container has no network).

Options:
- ``schema_ddl`` (required): DDL of the records, e.g. ``"id INT,
  name STRING"``. Fields are pulled from each JSON object by name;
  missing keys yield None.
- ``n_pages`` (required): total pages to read.
- ``pages_per_partition`` (default 8): fan-out granularity.
- ``base_url`` or ``fixture_dir`` (one required).

Usage::

    spark.dataSource.register(RestPagesDataSource)
    df = (spark.read.format("rest_pages")
          .option("schema_ddl", "id INT, name STRING")
          .option("n_pages", 40)
          .option("fixture_dir", "/data/pages")
          .load())
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RestPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_pages"

    def schema(self):
        ddl = self.options.get("schema_ddl")
        if not ddl:
            raise ValueError("rest_pages requires option schema_ddl")
        return ddl

    def reader(self, schema: StructType) -> DataSourceReader:
        return RestPagesReader(schema, self.options)


class RestPagesReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_fields = [f.name for f in schema.fields]
        self.n_pages = int(options.get("n_pages", "0"))
        self.per_part = int(options.get("pages_per_partition", "8"))
        self.base_url = options.get("base_url")
        self.fixture_dir = options.get("fixture_dir")
        self.max_retries = int(options.get("max_retries", "5"))
        self.backoff_base_s = float(options.get("backoff_base_s", "0.5"))
        if not (self.base_url or self.fixture_dir):
            raise ValueError("rest_pages requires base_url or fixture_dir")
        if self.n_pages <= 0:
            raise ValueError("rest_pages requires n_pages > 0")

    def partitions(self):
        return [
            PageRange(s, min(s + self.per_part, self.n_pages))
            for s in range(0, self.n_pages, self.per_part)
        ]

    def _fetch(self, page: int) -> list[dict]:
        if self.fixture_dir:
            p = os.path.join(self.fixture_dir, f"page-{page}.json")
            with open(p) as fh:
                return json.load(fh)
        # shared retrying transport (sources/rest.py): executor-side
        # page fetches back off on 429/5xx/socket errors with the same
        # exponential schedule the driver-side puller uses — one flaky
        # page must not fail a whole task-worth of pages
        from dimagi_data_platform_spark.sources.rest import http_get_json

        return http_get_json(
            self.base_url.format(page=page),
            max_retries=self.max_retries,
            backoff_base_s=self.backoff_base_s,
        )

    def read(self, partition: PageRange):
        for page in range(partition.start, partition.end):
            for rec in self._fetch(page):
                yield tuple(rec.get(f) for f in self.schema_fields)

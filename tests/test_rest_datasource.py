"""P58b: paginated REST ingestion through Spark 4's Python Data
Source API — page fetches distributed across executors via
InputPartitions (fixture-dir transport: no network in this
container)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dimagi_data_platform_spark.sources.rest_datasource import (
    RestPagesDataSource,
    RestPagesReader,
)


@pytest.fixture()
def pages(tmp_path):
    n_pages, per_page = 10, 7
    rid = 0
    for p in range(n_pages):
        recs = []
        for _ in range(per_page):
            recs.append({"id": rid, "name": f"rec-{rid}", "value": rid * 3})
            rid += 1
        (tmp_path / f"page-{p}.json").write_text(json.dumps(recs))
    return str(tmp_path), n_pages, per_page


def test_reads_all_pages_distributed(spark, pages):
    fixture_dir, n_pages, per_page = pages
    spark.dataSource.register(RestPagesDataSource)
    df = (
        spark.read.format("rest_pages")
        .option("schema_ddl", "id INT, name STRING, value INT")
        .option("n_pages", n_pages)
        .option("pages_per_partition", 3)
        .option("fixture_dir", fixture_dir)
        .load()
    )
    assert df.count() == n_pages * per_page
    # records arrive typed and complete, not stringly
    agg = df.agg(
        F.min("id").alias("lo"), F.max("id").alias("hi"), F.sum("value").alias("s")
    ).collect()[0]
    n = n_pages * per_page
    assert (agg["lo"], agg["hi"]) == (0, n - 1)
    assert agg["s"] == 3 * n * (n - 1) // 2
    # the page range really is partitioned for executor fan-out
    assert df.rdd.getNumPartitions() == 4  # ceil(10 / 3)


def test_missing_fields_yield_null(spark, tmp_path):
    (tmp_path / "page-0.json").write_text(json.dumps([{"id": 1}]))
    spark.dataSource.register(RestPagesDataSource)
    row = (
        spark.read.format("rest_pages")
        .option("schema_ddl", "id INT, name STRING")
        .option("n_pages", 1)
        .option("fixture_dir", str(tmp_path))
        .load()
        .collect()[0]
    )
    assert (row["id"], row["name"]) == (1, None)


def test_partition_planning_covers_range_exactly():
    reader = RestPagesReader.__new__(RestPagesReader)
    reader.n_pages, reader.per_part = 10, 3
    parts = RestPagesReader.partitions(reader)
    assert [(p.start, p.end) for p in parts] == [(0, 3), (3, 6), (6, 9), (9, 10)]


def test_options_validated():
    from pyspark.sql.types import StructType

    with pytest.raises(ValueError, match="base_url or fixture_dir"):
        RestPagesReader(StructType([]), {"n_pages": "5"})
    with pytest.raises(ValueError, match="n_pages"):
        RestPagesReader(StructType([]), {"fixture_dir": "/x"})


def _write_pages(d, start_rid, n_pages, per_page, first_page=0):
    rid = start_rid
    for p in range(first_page, first_page + n_pages):
        recs = []
        for _ in range(per_page):
            recs.append({"id": rid, "name": f"rec-{rid}", "value": rid * 3})
            rid += 1
        (d / f"page-{p}.json").write_text(json.dumps(recs))
    return rid


def test_stream_reads_pages_incrementally(spark, tmp_path):
    """P58c: the streaming source drains published pages, then picks up
    NEWLY published pages in the next drain against the SAME
    checkpoint — offset tracking across restarts, no reprocessing."""
    from dimagi_data_platform_spark.sources.rest_stream_datasource import (
        RestPagesStreamDataSource,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    rid = _write_pages(feed, 0, 4, 5)
    spark.dataSource.register(RestPagesStreamDataSource)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        (
            spark.readStream.format("rest_pages_stream")
            .option("schema_ddl", "id INT, name STRING, value INT")
            .option("fixture_dir", str(feed))
            .option("max_pages_per_batch", 3)
            .load()
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", out)
            .start()
            .awaitTermination()
        )

    def drain_all():
        # one availableNow drain advances ONE capped batch (the cap is
        # pacing, like maxFilesPerTrigger); loop until the cursor stops
        prev = -1
        while True:
            drain()
            n = spark.read.parquet(out).count()
            if n == prev:
                return
            prev = n

    drain_all()
    got1 = {r.id for r in spark.read.parquet(out).collect()}
    assert got1 == set(range(20))

    # publish 3 more pages, drain again with the SAME checkpoint
    _write_pages(feed, rid, 3, 5, first_page=4)
    drain_all()
    rows = spark.read.parquet(out).collect()
    ids = [r.id for r in rows]
    assert sorted(ids) == list(range(35)), "missed or duplicated pages"
    assert len(ids) == len(set(ids))
    # value column intact through the stream
    assert all(r.value == r.id * 3 for r in rows)


# ---------------------------------------------------------------------------
# Shared retrying transport (VERDICT r10 item 4): the DISTRIBUTED
# readers' page fetches must survive transient 429/5xx/socket failures
# with the same exponential-backoff contract as the driver-side puller.
# ---------------------------------------------------------------------------


def _flaky_opener(payload, fail_first=0, exc_factory=None):
    """Byte-level fake server for http_get_json's injected opener."""
    import urllib.error

    calls = {"n": 0}

    def opener(url, timeout):
        calls["n"] += 1
        if calls["n"] <= fail_first:
            if exc_factory is not None:
                raise exc_factory()
            raise urllib.error.HTTPError(url, 503, "flaky", None, None)
        return json.dumps(payload).encode()

    return opener, calls


def test_http_get_json_retries_transient_with_backoff():
    from dimagi_data_platform_spark.sources.rest import http_get_json

    opener, calls = _flaky_opener([{"id": 7}], fail_first=3)
    slept = []
    got = http_get_json(
        "https://api.example/pages/0", opener=opener, sleeper=slept.append
    )
    assert got == [{"id": 7}]
    assert slept == [0.5, 1.0, 2.0]  # the fetch_records schedule, shared
    assert calls["n"] == 4


def test_http_get_json_retries_socket_errors_too():
    import urllib.error

    from dimagi_data_platform_spark.sources.rest import http_get_json

    opener, calls = _flaky_opener(
        {"n_pages": 3},
        fail_first=2,
        exc_factory=lambda: urllib.error.URLError("connection reset"),
    )
    got = http_get_json(
        "https://api.example/n_pages", opener=opener, sleeper=lambda s: None
    )
    assert got == {"n_pages": 3}
    assert calls["n"] == 3


def test_http_get_json_gives_up_and_permanent_4xx_raises():
    import urllib.error

    from dimagi_data_platform_spark.sources.rest import http_get_json

    opener, calls = _flaky_opener([], fail_first=99)
    with pytest.raises(RuntimeError, match="giving up"):
        http_get_json(
            "https://api.example/pages/0",
            max_retries=3,
            opener=opener,
            sleeper=lambda s: None,
        )
    assert calls["n"] == 3

    def forbidden(url, timeout):
        raise urllib.error.HTTPError(url, 403, "forbidden", None, None)

    with pytest.raises(RuntimeError, match="permanent failure 403"):
        http_get_json(
            "https://api.example/pages/0", opener=forbidden, sleeper=lambda s: None
        )


def test_batch_datasource_fetch_survives_flaky_server(monkeypatch):
    """End-to-end through RestPagesReader._fetch: the urllib layer
    throws 503 twice, the shared transport backs off and the page
    arrives — the contract the executor-side read path runs under."""
    import urllib.error
    import urllib.request

    from pyspark.sql.types import StructType

    import dimagi_data_platform_spark.sources.rest as rest_mod

    reader = RestPagesReader(
        StructType([]),
        {"schema_ddl": "id INT", "n_pages": "1",
         "base_url": "https://api.example/pages/{page}"},
    )
    state = {"n": 0}

    class _Resp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self):
            return json.dumps([{"id": 42}]).encode()

    def fake_urlopen(url, timeout=None):
        state["n"] += 1
        assert url == "https://api.example/pages/0"
        if state["n"] <= 2:
            raise urllib.error.HTTPError(url, 503, "flaky", None, None)
        return _Resp()

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    import time as _time

    monkeypatch.setattr(_time, "sleep", lambda s: None)
    assert reader._fetch(0) == [{"id": 42}]
    assert state["n"] == 3


def test_stream_datasource_fetch_and_page_count_survive_flaky_server(monkeypatch):
    import urllib.error
    import urllib.request

    from pyspark.sql.types import StructType

    from dimagi_data_platform_spark.sources.rest_stream_datasource import (
        RestPagesStreamReader,
    )

    reader = RestPagesStreamReader(
        StructType([]),
        {"schema_ddl": "id INT",
         "base_url": "https://api.example/pages/{page}",
         "n_pages_url": "https://api.example/n_pages"},
    )
    state = {"n": 0}

    class _Resp:
        def __init__(self, body):
            self.body = body

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self):
            return json.dumps(self.body).encode()

    def fake_urlopen(url, timeout=None):
        state["n"] += 1
        if state["n"] % 2 == 1:  # every other call fails transiently
            raise urllib.error.HTTPError(url, 429, "slow down", None, None)
        if url.endswith("n_pages"):
            return _Resp({"n_pages": 2})
        return _Resp([{"id": int(url.rsplit("/", 1)[1])}])

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    import time as _time

    monkeypatch.setattr(_time, "sleep", lambda s: None)
    assert reader._available_pages() == 2
    assert reader._fetch(1) == [{"id": 1}]

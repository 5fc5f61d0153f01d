"""Persisted-artifact machinery: content keying, stale pruning, and
lazy build-once semantics (shared by the IVF/SQ indexes and the
co-purchase edge artifact)."""

from __future__ import annotations

import os

from dimagi_data_platform_spark.plans.queries import (
    _artifact_path,
    _ensure_artifact,
)


def _make_sf(tmp_path, content=b"x"):
    sf = tmp_path / "sfX"
    sf.mkdir(exist_ok=True)
    (sf / "lineitem.parquet").write_bytes(content)
    return str(sf)


def test_artifact_path_rekeys_on_source_change_and_prunes(tmp_path, monkeypatch):
    import dimagi_data_platform_spark.plans.queries as q

    sf = _make_sf(tmp_path)
    p1 = _artifact_path(sf, "edges", source_table="lineitem")
    os.makedirs(p1, exist_ok=True)
    # same source -> same path, dir untouched
    assert _artifact_path(sf, "edges", source_table="lineitem") == p1
    assert os.path.isdir(p1)
    # regenerated source (same size, new mtime_ns) -> NEW key, old dir
    # for the same prefix/tag pruned
    src = os.path.join(sf, "lineitem.parquet")
    st = os.stat(src)
    os.utime(src, ns=(st.st_atime_ns + 7, st.st_mtime_ns + 7))
    p2 = _artifact_path(sf, "edges", source_table="lineitem")
    assert p2 != p1
    assert not os.path.isdir(p1), "stale artifact dir must be pruned"


def test_ensure_artifact_builds_once_and_retries_partial(tmp_path):
    path = str(tmp_path / "art")
    calls = []

    def build(p):
        calls.append(p)
        os.makedirs(os.path.join(p, "items"), exist_ok=True)
        open(os.path.join(p, "items", "_SUCCESS"), "w").close()

    _ensure_artifact(path, ("items",), build)
    _ensure_artifact(path, ("items",), build)
    assert len(calls) == 1, "complete artifact must not rebuild"
    # builds happen in a tmp sibling, renamed into place atomically
    assert calls[0] != path and os.path.isdir(path)
    # a partial artifact (missing _SUCCESS) must rebuild
    os.remove(os.path.join(path, "items", "_SUCCESS"))
    _ensure_artifact(path, ("items",), build)
    assert len(calls) == 2
    assert os.path.exists(os.path.join(path, "items", "_SUCCESS"))

"""Incremental watermark ingestion — commcare-export parity.

The reference pulls only records newer than the last-seen
``server_modified_on`` per resource and checkpoints that watermark.
Same shape here: a small JSON watermark store + a filter pushed into
the source (parquet scan or JDBC predicate), so each run touches only
new data.

Protocol: read with ``incremental_read`` (filter > watermark), process,
then ``advance_watermark`` AFTER the downstream write succeeds —
at-least-once on failure, never lost data. The watermark value is
stored as exact microseconds to avoid string-precision drift.

Scale: the watermark predicate reaches the parquet footer / database
index (PushedFilters), so incremental runs scan only new row groups.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class WatermarkStore:
    """Tiny JSON key→value checkpoint file with atomic replace."""

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def get(self, name: str) -> int | None:
        return self._load().get(name)

    def set(self, name: str, value: int) -> None:
        state = self._load()
        state[name] = value
        d = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d)
        with os.fdopen(fd, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)


def incremental_read(
    df: DataFrame, ts_col: str, store: WatermarkStore, name: str
) -> DataFrame:
    """Rows strictly newer than the stored watermark (all rows if none)."""
    wm = store.get(name)
    if wm is None:
        return df
    return df.filter(F.unix_micros(F.col(ts_col)) > F.lit(wm))


def advance_watermark(
    df: DataFrame, ts_col: str, store: WatermarkStore, name: str
) -> int | None:
    """Persist max(ts) of the processed batch; returns the new watermark
    (None and no-op for an empty batch)."""
    row = df.agg(F.max(F.unix_micros(F.col(ts_col))).alias("wm")).collect()[0]
    if row.wm is not None:
        store.set(name, int(row.wm))
    return row.wm

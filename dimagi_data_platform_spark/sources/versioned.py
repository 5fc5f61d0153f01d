"""Versioned parquet tables — lakehouse-lite (Delta/Iceberg pattern).

This container has no Delta/Iceberg connector jars, so format-native
ACID is out of reach; what a data platform actually *uses* those
formats for is reproduced here with plain parquet + a JSON manifest:

- **snapshot isolation / time travel**: every write is a NEW
  immutable version directory ``v=<n>``; readers resolve the manifest
  first, so a reader never sees a half-written version (the manifest
  is replaced atomically AFTER the parquet commit);
- **MERGE (copy-on-write)**: latest-wins key merge materialized as
  the next version — the Delta ``MERGE INTO`` semantics, costed like
  Delta's copy-on-write path;
- **history / rollback**: the manifest lists every committed version
  with its commit timestamp and row count; ``read_version`` pins any
  of them, ``read_asof`` resolves a timestamp (event-time travel);
- **vacuum**: drops version directories past a retention count while
  keeping the manifest consistent (truncate manifest FIRST, then
  delete files — a crashed vacuum leaves unreferenced garbage, never
  a dangling manifest entry).

Concurrency contract: SINGLE WRITER (the manifest replace is the
commit point; concurrent writers would need a lock service or a real
table format — documented limitation, same posture as
sources/incremental.upsert_partitioned). Readers are lock-free.

Scale: a version commit writes only the new snapshot's files; reads
are ordinary parquet scans of exactly one version directory (all
pushdown/pruning intact). For tables where full copy-on-write is too
expensive, use upsert_partitioned (touched-partitions-only) and treat
each partition overwrite as the commit unit.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


def _manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST)


def history(path: str) -> list[dict]:
    """Committed versions, oldest first: [{version, commit_ts, n_rows}]."""
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return []
    with open(mp) as f:
        return json.load(f)["versions"]


def _commit(path: str, entry: dict) -> None:
    versions = history(path) + [entry]
    os.makedirs(path, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"versions": versions}, f)
    os.replace(tmp, _manifest_path(path))  # atomic commit point


def write_version(
    df: DataFrame, path: str, commit_ts: str, extra: dict | None = None
) -> int:
    """Commit ``df`` as the next immutable version; returns its number.

    ``commit_ts`` is caller-supplied (ISO-8601) so ingestion pipelines
    commit with their watermark/event time and tests stay
    deterministic. The parquet write happens BEFORE the manifest
    replace — a crash in between leaves an unreferenced directory,
    never a readable half-version.

    ``extra`` fields land in the manifest entry IN the atomic commit
    (the streaming sink stamps its micro-batch id this way, so "data
    committed" and "batch id recorded" are one swap — there is no
    crash window where the state exists but the replay marker doesn't).
    """
    versions = history(path)
    n = versions[-1]["version"] + 1 if versions else 1
    vdir = os.path.join(path, f"v={n}")
    # overwrite, deliberately: version n is not in the manifest, so if
    # the directory exists it is garbage from a write that crashed
    # BEFORE its manifest commit — overwriting it IS the recovery
    # (errorifexists would brick the table after any such crash)
    df.write.mode("overwrite").parquet(vdir)
    n_rows = df.sparkSession.read.parquet(vdir).count()
    entry = {"version": n, "commit_ts": commit_ts, "n_rows": n_rows}
    if extra:
        entry.update(extra)
    _commit(path, entry)
    return n


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Latest version, or time-travel to a pinned one."""
    versions = history(path)
    if not versions:
        raise FileNotFoundError(f"no committed versions at {path}")
    live = {v["version"] for v in versions}
    if version is None:
        version = max(live)
    elif version not in live:
        raise ValueError(
            f"version {version} not in manifest (live: {sorted(live)})"
        )
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def read_asof(spark: SparkSession, path: str, ts: str) -> DataFrame:
    """The table as of ``ts``: the last version committed at or before
    it (ISO-8601 strings compare lexicographically)."""
    eligible = [v for v in history(path) if v["commit_ts"] <= ts]
    if not eligible:
        raise ValueError(f"no version committed at or before {ts} in {path}")
    return read_version(spark, path, eligible[-1]["version"])


def merge_version(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    commit_ts: str,
    extra: dict | None = None,
) -> int:
    """Delta-style MERGE as copy-on-write: latest-wins by ``order_col``
    per ``keys`` between the current version and ``updates``,
    committed as the next version. Rows only in the base survive; rows
    only in updates insert; conflicts resolve to the max order_col
    (tie → update wins). One (keys)-shuffled window, the standard
    merge cost."""
    from pyspark.sql import Window

    base = read_version(spark, path)
    # update rows sort after base rows on ties -> "WHEN MATCHED UPDATE"
    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), F.desc("__src")
    )
    merged = (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
        .localCheckpoint()  # materialize before writing over our read
    )
    return write_version(merged, path, commit_ts, extra=extra)


def vacuum(path: str, keep_last: int) -> list[int]:
    """Drop all but the newest ``keep_last`` versions; returns the
    dropped version numbers. Manifest truncates FIRST (atomic), file
    deletion follows — a crash leaves garbage directories, never a
    manifest entry pointing at deleted data."""
    versions = history(path)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    drop = versions[:-keep_last]
    keep = versions[-keep_last:]
    if not drop:
        return []
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"versions": keep}, f)
    os.replace(tmp, _manifest_path(path))
    dropped = []
    for v in drop:
        shutil.rmtree(os.path.join(path, f"v={v['version']}"), ignore_errors=True)
        dropped.append(v["version"])
    return dropped


def read_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
    key_cols: list[str],
) -> DataFrame:
    """Change data feed between two committed versions (the Delta CDF
    / Iceberg changelog pattern): returns every key whose row was
    inserted, deleted, or updated between ``from_version`` (exclusive
    base) and ``to_version``, with a ``_change_type`` column in
    {'insert', 'delete', 'update_preimage', 'update_postimage'} —
    update keys emit BOTH images, exactly like Delta CDF, so a
    downstream incremental consumer can retract-and-apply.

    Implementation: full-outer join of the two pinned snapshots on the
    key with a null-safe any-column comparison — the P25 snapshot-diff
    classification lifted onto the versioned-table surface. Cost is a
    scan of the two version directories + one key-grain shuffle; at
    scale, partition/bucket both snapshots by the key so the join is
    co-located (sources/bucketed.py). Keys must be unique per version
    (the merge_version invariant).
    """
    old = read_version(spark, path, from_version)
    new = read_version(spark, path, to_version)
    val_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") if c not in key_cols else F.col(c) for c in old.columns]
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") if c not in key_cols else F.col(c) for c in new.columns]
    )
    j = o.join(n, key_cols, "full_outer")
    # presence flags must not depend on value NULLs: use a marker join
    o_m = old.select(*key_cols).withColumn("__in_old", F.lit(True))
    n_m = new.select(*key_cols).withColumn("__in_new", F.lit(True))
    m = o_m.join(n_m, key_cols, "full_outer").select(
        *key_cols,
        F.coalesce("__in_old", F.lit(False)).alias("__in_old"),
        F.coalesce("__in_new", F.lit(False)).alias("__in_new"),
    )
    changed = F.lit(False)
    for c in val_cols:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    full = j.join(m, key_cols)
    inserts = (
        full.filter(~F.col("__in_old") & F.col("__in_new"))
        .select(*key_cols, *[F.col(f"__n_{c}").alias(c) for c in val_cols])
        .withColumn("_change_type", F.lit("insert"))
    )
    deletes = (
        full.filter(F.col("__in_old") & ~F.col("__in_new"))
        .select(*key_cols, *[F.col(f"__o_{c}").alias(c) for c in val_cols])
        .withColumn("_change_type", F.lit("delete"))
    )
    upd = full.filter(F.col("__in_old") & F.col("__in_new") & changed)
    pre = upd.select(
        *key_cols, *[F.col(f"__o_{c}").alias(c) for c in val_cols]
    ).withColumn("_change_type", F.lit("update_preimage"))
    post = upd.select(
        *key_cols, *[F.col(f"__n_{c}").alias(c) for c in val_cols]
    ).withColumn("_change_type", F.lit("update_postimage"))
    return inserts.unionAll(deletes).unionAll(pre).unionAll(post)


def read_bitemporal(
    spark: SparkSession,
    path: str,
    tx_ts: str,
    valid_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Bitemporal point query over a versioned SCD2 table — the two
    time axes composed (Snodgrass bitemporal model): TRANSACTION time
    resolves via the manifest (``read_asof``: the last version
    committed at or before ``tx_ts`` — what the warehouse KNEW then,
    immune to later restatements), then VALID time filters the SCD2
    intervals (``valid_from <= valid_ts < valid_to``, open-ended
    current rows included — what was TRUE then). "What did we believe
    on March 1 about the customer's tier on Jan 15" is one call.

    Scale: an ordinary pruned parquet scan of ONE version directory +
    a scan-local interval filter — both axes cost nothing beyond the
    snapshot read."""
    snap = read_asof(spark, path, tx_ts)
    v = F.lit(valid_ts).cast("timestamp")
    return snap.filter(
        (F.col(valid_from) <= v)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > v))
    )

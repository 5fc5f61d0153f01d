"""P62d: merge-on-read deletion vectors (VERDICT r8 item 4).

merge_version_dv writes a deletion-vector sidecar + delta files instead
of rewriting the snapshot; reads resolve the chain (anti-join + union);
compaction folds it back to a materialized version; vacuum keeps DV
base chains live; OCC semantics are preserved — including the
read→commit TOCTOU window where a content-changing concurrent commit
must surface as a conflict, never a silently lost update.
"""

from __future__ import annotations

import os

import pytest

from dimagi_data_platform_spark.sources import versioned as V


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _content(spark, p, version=None):
    return {
        r.id: (r.ver, r.v)
        for r in V.read_version(spark, p, version).collect()
    }


BASE = [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")]
UPD = [(2, 2, "b2"), (3, 1, "c2"), (4, 1, "d")]  # update, tie-win, insert
SCHEMA = "id long, ver long, v string"


def test_dv_merge_equals_cow_merge(spark, tmp_path):
    """Same base + same updates through merge_version (copy-on-write)
    and merge_version_dv (merge-on-read) must produce IDENTICAL logical
    rows — only the physical layout differs (dv/ + delta/ sidecars vs a
    full rewrite)."""
    cow, dv = str(tmp_path / "cow"), str(tmp_path / "dv")
    for p in (cow, dv):
        V.write_version(_mk(spark, BASE, SCHEMA), p, "2024-01-01")
    V.merge_version(spark, cow, _mk(spark, UPD, SCHEMA), ["id"], "ver", "2024-02-01")
    n = V.merge_version_dv(
        spark, dv, _mk(spark, UPD, SCHEMA), ["id"], "ver", "2024-02-01"
    )
    assert n == 2
    assert _content(spark, cow) == _content(spark, dv) == {
        1: (1, "a"), 2: (2, "b2"), 3: (1, "c2"), 4: (1, "d")
    }
    e = V.history(dv)[-1]
    assert e["dv"] is True and e["base_version"] == 1
    assert e["n_deleted"] == 2 and e["n_delta"] == 3  # keys 2,3 replaced
    assert e["n_rows"] == 4
    # physical: the DV commit's data dir holds ONLY the sidecars — the
    # write scales with the batch, not the table
    d = V._data_dir(dv, e)
    assert sorted(x for x in os.listdir(d) if not x.startswith(".")) == [
        "delta", "dv",
    ]
    assert spark.read.parquet(os.path.join(d, "dv")).count() == 2
    assert spark.read.parquet(os.path.join(d, "delta")).count() == 3


def test_dv_losing_updates_are_dropped_at_write_time(spark, tmp_path):
    """An update OLDER than the base row must not tombstone it."""
    p = str(tmp_path / "tbl")
    V.write_version(_mk(spark, [(1, 5, "new")], SCHEMA), p, "2024-01-01")
    V.merge_version_dv(
        spark, p, _mk(spark, [(1, 2, "stale")], SCHEMA), ["id"], "ver", "2024-02-01"
    )
    assert _content(spark, p) == {1: (5, "new")}
    e = V.history(p)[-1]
    assert e["n_deleted"] == 0 and e["n_delta"] == 0 and e["n_rows"] == 1


def test_dv_chain_stacks_and_timetravel_resolves_each_link(spark, tmp_path):
    """Two stacked DV merges: latest resolves through both links, and
    time travel pins any intermediate logical snapshot."""
    p = str(tmp_path / "tbl")
    V.write_version(_mk(spark, BASE, SCHEMA), p, "2024-01-01")
    V.merge_version_dv(
        spark, p, _mk(spark, [(2, 2, "b2")], SCHEMA), ["id"], "ver", "2024-02-01"
    )
    V.merge_version_dv(
        spark, p, _mk(spark, [(2, 3, "b3"), (5, 1, "e")], SCHEMA),
        ["id"], "ver", "2024-03-01",
    )
    assert _content(spark, p, 1) == {1: (1, "a"), 2: (1, "b"), 3: (1, "c")}
    assert _content(spark, p, 2) == {1: (1, "a"), 2: (2, "b2"), 3: (1, "c")}
    assert _content(spark, p) == {
        1: (1, "a"), 2: (3, "b3"), 3: (1, "c"), 5: (1, "e")
    }


def test_cdf_across_dv_commit(spark, tmp_path):
    """read_changes spanning a DV commit classifies exactly like the
    copy-on-write path (it reads logical snapshots)."""
    p = str(tmp_path / "tbl")
    V.write_version(_mk(spark, BASE, SCHEMA), p, "2024-01-01")
    V.merge_version_dv(
        spark, p, _mk(spark, UPD, SCHEMA), ["id"], "ver", "2024-02-01"
    )
    ch = {
        (r.id, r._change_type): (r.ver, r.v)
        for r in V.read_changes(spark, p, 1, 2, ["id"]).collect()
    }
    assert ch == {
        (2, "update_preimage"): (1, "b"),
        (2, "update_postimage"): (2, "b2"),
        (3, "update_preimage"): (1, "c"),
        (3, "update_postimage"): (1, "c2"),
        (4, "insert"): (1, "d"),
    }


def test_compaction_folds_dv_chain_then_vacuum_retires_it(spark, tmp_path):
    """compact_version materializes the DV chain; vacuum(keep_last=1)
    can then retire every chain link and the table stays readable as
    one plain parquet scan."""
    p = str(tmp_path / "tbl")
    V.write_version(_mk(spark, BASE, SCHEMA), p, "2024-01-01")
    V.merge_version_dv(
        spark, p, _mk(spark, UPD, SCHEMA), ["id"], "ver", "2024-02-01"
    )
    want = _content(spark, p)
    n = V.compact_version(spark, p, "2024-03-01")
    assert n == 3 and not V.history(p)[-1].get("dv")
    V.vacuum(p, keep_last=1, stage_retention_sec=0)
    assert [h["version"] for h in V.history(p)] == [3]
    assert _content(spark, p) == want


def test_vacuum_keeps_dv_base_chain_live(spark, tmp_path):
    """vacuum(keep_last=1) with a DV head must keep the transitive base
    chain (entries AND data) or the head becomes unreadable."""
    p = str(tmp_path / "tbl")
    V.write_version(_mk(spark, BASE, SCHEMA), p, "2024-01-01")
    V.merge_version_dv(
        spark, p, _mk(spark, [(2, 2, "b2")], SCHEMA), ["id"], "ver", "2024-02-01"
    )
    V.merge_version_dv(
        spark, p, _mk(spark, [(5, 1, "e")], SCHEMA), ["id"], "ver", "2024-03-01"
    )
    want = _content(spark, p)
    dropped = V.vacuum(p, keep_last=1, stage_retention_sec=0)
    # nothing droppable: v3 reads through v2 reads through v1
    assert dropped == []
    assert [h["version"] for h in V.history(p)] == [1, 2, 3]
    assert _content(spark, p) == want


def test_dv_merge_schema_evolution_additive(spark, tmp_path):
    """A widened update batch through the DV path: old rows read NULL
    in the new column, exactly like the copy-on-write path."""
    p = str(tmp_path / "tbl")
    V.write_version(_mk(spark, [(1, 1, "a"), (2, 1, "b")], SCHEMA), p, "2024-01-01")
    V.merge_version_dv(
        spark, p,
        _mk(spark, [(2, 2, "b2", 7), (3, 1, "c", 9)],
            "id long, ver long, v string, w long"),
        ["id"], "ver", "2024-02-01",
    )
    got = {r.id: (r.v, r.w) for r in V.read_version(spark, p).collect()}
    assert got == {1: ("a", None), 2: ("b2", 7), 3: ("c", 9)}


def test_content_changing_race_surfaces_as_conflict(spark, tmp_path, monkeypatch):
    """The read→commit TOCTOU window: a CONTENT-CHANGING concurrent
    commit (not a no-op compaction) lands between the merge's base read
    and its commit. The merge must detect the conflict via its pinned
    expected version, RECOMPUTE against the winner's snapshot, and
    commit on top — never commit its stale result at a higher number
    (the silently-lost-update failure)."""
    for mergefn in (V.merge_version, V.merge_version_dv):
        p = str(tmp_path / f"tbl_{mergefn.__name__}")
        V.write_version(_mk(spark, [(1, 1, "a")], SCHEMA), p, "2024-01-01")

        state = {"injected": False}
        real_commit = V._commit

        def racing_commit(path, entry, _state=state):
            if not _state["injected"]:
                _state["injected"] = True
                # the racer REPLACES the table contents at version 2
                V.write_version(
                    _mk(spark, [(9, 1, "z")], SCHEMA), path, "2024-01-02"
                )
            real_commit(path, entry)

        monkeypatch.setattr(V, "_commit", racing_commit)
        n = mergefn(
            spark, p, _mk(spark, [(2, 1, "c")], SCHEMA),
            ["id"], "ver", "2024-01-03",
        )
        monkeypatch.setattr(V, "_commit", real_commit)
        assert n == 3 and state["injected"]
        # serializable outcome: the merge applied AFTER the racer, so
        # the racer's snapshot {9} is the base — key 1 must NOT
        # resurrect from the merge's stale first read
        assert _content(spark, p) == {9: (1, "z"), 2: (1, "c")}


def test_dv_null_order_base_row_tombstones_like_cow(spark, tmp_path):
    """ADVICE r9: a base row whose order_col is NULL must MATCH an
    update (presence is a separate marker from __b_ord) and lose
    latest-wins (desc-nulls-last), identically on the COW and DV paths
    — the pre-r10 DV path inserted a duplicate key instead."""
    base = [(1, None, "a"), (2, 1, "b")]
    upd = [(1, 1, "a2"), (2, None, "stale")]
    cow, dv = str(tmp_path / "cow"), str(tmp_path / "dv")
    for p in (cow, dv):
        V.write_version(_mk(spark, base, SCHEMA), p, "2024-01-01")
    V.merge_version(spark, cow, _mk(spark, upd, SCHEMA), ["id"], "ver", "2024-02-01")
    V.merge_version_dv(spark, dv, _mk(spark, upd, SCHEMA), ["id"], "ver", "2024-02-01")
    # key 1: NULL-order base loses to the ver=1 update (tombstoned,
    # exactly one row survives); key 2: NULL-order UPDATE loses to the
    # ver=1 base row
    want = {1: (1, "a2"), 2: (1, "b")}
    assert _content(spark, cow) == want
    assert _content(spark, dv) == want
    e = V.history(dv)[-1]
    assert e["n_deleted"] == 1 and e["n_delta"] == 1 and e["n_rows"] == 2


def test_dv_merge_rejects_duplicate_key_base(spark, tmp_path):
    """ADVICE r9: a base seeded via write_version with duplicate keys
    breaks the incremental n_rows bookkeeping (and the anti-join would
    delete ALL duplicates while accounting one) — the first DV merge
    must verify the unique-key invariant and raise."""
    p = str(tmp_path / "tbl")
    V.write_version(
        _mk(spark, [(1, 1, "a"), (1, 2, "a-dup"), (2, 1, "b")], SCHEMA),
        p, "2024-01-01",
    )
    with pytest.raises(ValueError, match="duplicate rows per key"):
        V.merge_version_dv(
            spark, p, _mk(spark, [(2, 2, "b2")], SCHEMA),
            ["id"], "ver", "2024-02-01",
        )
    # the COW path tolerates the seed (its window dedups) — unchanged
    V.merge_version(
        spark, p, _mk(spark, [(2, 2, "b2")], SCHEMA), ["id"], "ver", "2024-02-01"
    )
    assert _content(spark, p) == {1: (2, "a-dup"), 2: (2, "b2")}


def test_dv_long_chain_reads_iteratively_and_autocompacts(spark, tmp_path):
    """ADVICE r9 + VERDICT item 4: the chain resolves ITERATIVELY (a
    depth over Python's default recursion limit must read fine when
    auto-compaction is disabled at small depth), and with the
    auto-compact threshold the chain depth stays bounded across a long
    merge run — read plans flat, history records dv_depth."""
    p = str(tmp_path / "tbl")
    V.write_version(_mk(spark, [(1, 0, "v0")], SCHEMA), p, "2024-01-01")
    # bounded run with a tiny threshold: depth must never exceed it
    for i in range(1, 8):
        V.merge_version_dv(
            spark, p, _mk(spark, [(1, i, f"v{i}")], SCHEMA),
            ["id"], "ver", f"2024-01-{i + 1:02d}", auto_compact_depth=3,
        )
        hist = V.history(p)
        depths = [h.get("dv_depth", 0) for h in hist]
        assert max(depths) <= 3, depths
    assert _content(spark, p) == {1: (7, "v7")}
    # read-cost flatness: the latest snapshot's plan carries at most
    # auto_compact_depth chain links (one Union per un-compacted DV
    # commit) no matter how many merges ran
    plan = V.read_version(spark, p)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Union") <= 3, plan
    # every 3rd merge folded the chain: compaction entries interleave
    assert any(h.get("compaction") for h in V.history(p))
    # dv_depth observability: the entry AFTER a compaction restarts at 1
    by_n = {h["version"]: h for h in V.history(p)}
    comp = [h["version"] for h in V.history(p) if h.get("compaction")]
    after = [by_n[c + 1] for c in comp if c + 1 in by_n]
    assert all(h.get("dv_depth") == 1 for h in after if h.get("dv"))


def test_dv_chain_disabled_autocompact_resolves_deep_chain(spark, tmp_path):
    """With auto-compaction OFF, a deep chain resolves through the
    ITERATIVE walk (the recursive pre-r10 resolve is structurally gone
    — no self-call remains, so chain depth can never hit Python's
    recursion limit) and correctness does not depend on writers having
    compacted. 12 links (r15: down from 40 — the walk is depth-uniform
    code, so behavioral coverage is identical while the sequential
    merge loop stops dominating the suite wall; recursion-freedom is
    asserted structurally below, not by depth)."""
    p = str(tmp_path / "tbl")
    V.write_version(_mk(spark, [(1, 0, "v0")], SCHEMA), p, "2024-01-01")
    depth = 12
    for i in range(1, depth + 1):
        V.merge_version_dv(
            spark, p, _mk(spark, [(1, i, f"v{i}")], SCHEMA),
            ["id"], "ver", f"2024-02-01T{i:02d}", auto_compact_depth=None,
        )
    hist = V.history(p)
    assert hist[-1]["dv_depth"] == depth
    assert not any(h.get("compaction") for h in hist)
    assert _content(spark, p) == {1: (depth, f"v{depth}")}
    # the structural guarantee: _resolve_snapshot never calls itself
    import inspect

    src = inspect.getsource(V._resolve_snapshot)
    body = src.split('"""', 2)[2]  # skip signature + docstring
    assert "_resolve_snapshot" not in body

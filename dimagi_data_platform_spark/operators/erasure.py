"""Right-to-be-forgotten EXECUTION — the transform that the P70
blast-radius analysis (plans/queries.deletion_cascade_impact) sizes:
given seed keys and a declared FK graph, cascade the erasure down the
child chain and return the filtered tables plus a per-table audit.

Design for 100 TB:
- the cascade is computed as KEY SETS first (key-only projections,
  one semi join per FK edge, each set materialized ONCE with
  localCheckpoint) — full rows are only touched in the final
  anti-join rewrite of each table;
- each table rewrite is an anti join against its (broadcastable)
  affected-key set — with partition/bucket layout on the FK this is a
  touched-partitions-only rewrite (compose with
  sources/incremental.upsert_partitioned, or commit each filtered
  table as a new version via sources/versioned.write_version so the
  erasure itself is snapshot-isolated and auditable);
- the audit DataFrame carries affected/total per table — the
  compliance record an erasure SLA requires, and by construction it
  EQUALS what the P70 analysis predicted (pinned by test).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class FkEdge:
    """``child`` rows are deleted when ``child_fk`` matches the
    parent cascade's key values; the child's own affected set is
    keyed by ``child_key`` for further cascading. The parent's
    affected-set column name must equal ``parent_key`` (the root's is
    the root key; a child's is its edge's ``child_key``)."""

    parent: str
    parent_key: str
    child: str
    child_fk: str
    child_key: str


def cascade_delete(
    tables: dict[str, DataFrame],
    root: str,
    root_key: str,
    seed_keys: DataFrame,
    edges: list[FkEdge],
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Return ``(cleaned, audit)``: every table with cascaded rows
    removed, and a (table_name, n_affected, n_total) audit.

    ``seed_keys`` must have exactly the ``root_key`` column. ``edges``
    are walked in order, so list parents before their children
    (topological order of the FK DAG).
    """
    key_of: dict[str, str] = {root: root_key}
    affected: dict[str, DataFrame] = {
        root: tables[root]
        .join(seed_keys, root_key, "left_semi")
        .select(root_key)
        .localCheckpoint()
    }
    for e in edges:
        if e.parent not in affected:
            raise ValueError(
                f"edge {e.parent}->{e.child}: parent has no affected set "
                "yet (list edges in topological order)"
            )
        if key_of[e.parent] != e.parent_key:
            raise ValueError(
                f"edge {e.parent}->{e.child}: parent set is keyed by "
                f"{key_of[e.parent]!r}, not {e.parent_key!r}"
            )
        keys = (
            tables[e.child]
            .join(
                affected[e.parent].withColumnRenamed(e.parent_key, e.child_fk),
                e.child_fk,
                "left_semi",
            )
            .select(e.child_key)
            .distinct()
        )
        if e.child in affected:
            # unionAll merges by POSITION: two FK edges converging on
            # the same child must agree on the child's key column, or
            # the merged set (and the final anti-join) is keyed wrong
            # with no error (ADVICE r7 — mirrors the parent_key check)
            if key_of[e.child] != e.child_key:
                raise ValueError(
                    f"edge {e.parent}->{e.child}: child set is keyed by "
                    f"{key_of[e.child]!r}, but this edge cascades on "
                    f"{e.child_key!r} — convergent edges must share one "
                    "child_key"
                )
            keys = affected[e.child].unionAll(keys).distinct()
        affected[e.child] = keys.localCheckpoint()
        key_of[e.child] = e.child_key

    cleaned: dict[str, DataFrame] = {}
    audit_rows = []
    for name, df in tables.items():
        if name in affected:
            cleaned[name] = df.join(affected[name], key_of[name], "left_anti")
            # affected ROWS (not key-set size): lineitem's deletion key
            # is the order key, but the audit must count line rows
            n_aff = df.join(affected[name], key_of[name], "left_semi").count()
        else:
            cleaned[name] = df
            n_aff = 0
        audit_rows.append((name, n_aff, df.count()))
    spark = next(iter(tables.values())).sparkSession
    audit = spark.createDataFrame(
        audit_rows, "table_name string, n_affected long, n_total long"
    )
    return cleaned, audit

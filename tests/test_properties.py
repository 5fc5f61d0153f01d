"""Property-based tests (hypothesis) for the core algebraic
operators — randomized small inputs with adversarial ties/duplicates,
each checked against a straightforward pure-Python reference model.
Deterministic seeds (derandomize) so CI never flakes; low example
counts because each example runs a real Spark job.

Invariants covered:
- sessionize: boundary semantics (strictly-greater-than-gap splits),
  session ids are 1-based dense, per-entity partition of events;
- asof_join backward/forward vs the nearest-row reference;
- global_prefix_sums vs itertools.accumulate on the sorted input;
- KMV sketch: merge associativity and equality with the one-shot
  sketch of the union (the mergeable-sketch law, exactly);
- interval_overlap_join vs the naive O(n²) overlap reference across
  bucket-straddling widths;
- connected_components (both algorithms) vs a union-find reference
  over random small graphs incl. self-loops and singletons;
- scd2_history: intervals tile the observation span exactly, and
  every as-of probe answers the "last observation ≤ ts" reference.
"""

from __future__ import annotations

import datetime as dt
from itertools import accumulate

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 120)),  # (user, ts sec)
        min_size=1,
        max_size=25,
    )
)
@SET
def test_sessionize_matches_reference(spark, rows):
    from dimagi_data_platform_spark.operators.sessionize import sessionize

    data = [(u, _ts(s), i) for i, (u, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "user_id int, ts timestamp, event_id int")
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessionize(df, "user_id", "ts", gap_seconds=30,
                            tie_break="event_id").collect()
    }
    # reference: sort per user by (ts, event_id); split when gap > 30s
    by_user: dict[int, list[tuple[dt.datetime, int]]] = {}
    for u, t, i in data:
        by_user.setdefault(u, []).append((t, i))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for t, i in evs:
            if prev is None or (t - prev).total_seconds() > 30:
                sid += 1
            want[(u, i)] = sid
            prev = t
    assert got == want


@given(
    st.lists(st.integers(0, 100), min_size=1, max_size=20),   # left ts
    st.lists(st.integers(0, 100), min_size=0, max_size=20),   # right ts
    st.sampled_from(["backward", "forward"]),
)
@SET
def test_asof_join_matches_reference(spark, lts, rts, direction):
    from dimagi_data_platform_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _ts(s), i) for i, s in enumerate(lts)],
        "k int, lt timestamp, lid int",
    )
    right = spark.createDataFrame(
        [(1, _ts(s), i) for i, s in enumerate(rts)],
        "k int, rt timestamp, rid int",
    )
    out = asof_join(
        left,
        right.withColumn("carried", right["rt"]),
        by=["k"],
        left_ts="lt",
        right_ts="rt",
        carry=["carried"],
        right_tiebreak="rid",
        direction=direction,
    )
    got = {r["lid"]: r["carried"] for r in out.collect()}
    for i, s in enumerate(lts):
        if direction == "backward":
            cand = [x for x in rts if x <= s]
            want = _ts(max(cand)) if cand else None
        else:
            cand = [x for x in rts if x >= s]
            want = _ts(min(cand)) if cand else None
        assert got.get(i) == want, (i, s, direction)


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(-5, 5)),  # (key, measure)
        min_size=1,
        max_size=40,
    )
)
@SET
def test_global_prefix_sums_matches_accumulate(spark, rows):
    from dimagi_data_platform_spark.operators.linkage import global_prefix_sums

    # one row per distinct key (the operator's distinct-grain contract)
    agg: dict[int, int] = {}
    for k, m in rows:
        agg[k] = agg.get(k, 0) + m
    df = spark.createDataFrame(
        [(k, v) for k, v in agg.items()], "k int, m long"
    )
    out = global_prefix_sums(df, ["k"], ["m"])
    got = {r["k"]: r["cum_m"] for r in out.collect()}
    keys = sorted(agg)
    for k, c in zip(keys, accumulate(agg[k] for k in keys)):
        assert got[k] == c


@given(
    st.lists(st.integers(0, 10_000), min_size=0, max_size=30),
    st.lists(st.integers(0, 10_000), min_size=0, max_size=30),
    st.lists(st.integers(0, 10_000), min_size=0, max_size=30),
)
@SET
def test_kmv_merge_is_associative_and_lossless(spark, xs, ys, zs):
    from dimagi_data_platform_spark.operators.sketches import (
        kmv_merge,
        kmv_partial,
    )

    k = 8

    def sketch(vals):
        if not vals:
            return spark.createDataFrame([], "g int, h long").select("g", "h")
        df = spark.createDataFrame([(1, v) for v in vals], "g int, v int")
        return kmv_partial(df, "v", ["g"], k)

    def rows(df):
        return {(r["g"], r["h"]) for r in df.collect()}

    a, b, c = sketch(xs), sketch(ys), sketch(zs)
    ab_c = kmv_merge(kmv_merge(a.unionAll(b), ["g"], k).unionAll(c), ["g"], k)
    a_bc = kmv_merge(a.unionAll(kmv_merge(b.unionAll(c), ["g"], k)), ["g"], k)
    union = sketch(xs + ys + zs)
    assert rows(ab_c) == rows(a_bc) == rows(union)


@given(
    st.lists(
        st.tuples(st.integers(0, 7200), st.integers(0, 7200)),
        min_size=0,
        max_size=12,
    ),
    st.lists(
        st.tuples(st.integers(0, 7200), st.integers(0, 7200)),
        min_size=0,
        max_size=12,
    ),
)
@SET
def test_interval_overlap_join_matches_naive(spark, lraw, rraw):
    from dimagi_data_platform_spark.operators.intervals import (
        interval_overlap_join,
    )

    lint = [(min(a, b), max(a, b)) for a, b in lraw]
    rint = [(min(a, b), max(a, b)) for a, b in rraw]
    left = spark.createDataFrame(
        [(i, _ts(a), _ts(b)) for i, (a, b) in enumerate(lint)],
        "lid int, lo timestamp, hi timestamp",
    )
    right = spark.createDataFrame(
        [(i, _ts(a), _ts(b)) for i, (a, b) in enumerate(rint)],
        "rid int, r_lo timestamp, r_hi timestamp",
    )
    out = interval_overlap_join(left, right, bucket_micros=600 * 1_000_000)
    got = {(r["lid"], r["rid"]) for r in out.collect()}
    want = {
        (i, j)
        for i, (a, b) in enumerate(lint)
        for j, (c, d) in enumerate(rint)
        if a <= d and c <= b
    }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0,
        max_size=20,
    ),
    st.sampled_from(["propagate", "star"]),
)
@SET
def test_connected_components_matches_union_find(spark, eraw, algorithm):
    from dimagi_data_platform_spark.operators.components import (
        connected_components,
    )

    verts = sorted({v for e in eraw for v in e} | {0})
    vdf = spark.createDataFrame([(v,) for v in verts], "id int")
    edf = spark.createDataFrame(
        [(a, b) for a, b in eraw] or [(0, 0)], "src int, dst int"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            vdf, edf, algorithm=algorithm
        ).collect()
    }
    # union-find reference, min-id as the canonical label
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in eraw:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in verts}
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 3)),  # (ts sec, attr)
        min_size=1,
        max_size=20,
    )
)
@SET
def test_scd2_history_tiles_and_answers_asof(spark, obs):
    from dimagi_data_platform_spark.operators.scd import scd2_history

    data = [(1, _ts(s), str(a), i) for i, (s, a) in enumerate(obs)]
    df = spark.createDataFrame(
        data, "k int, ts timestamp, attr string, seq int"
    )
    rows = sorted(
        scd2_history(df, "k", "ts", "attr", "seq").collect(),
        key=lambda r: r["valid_from"],
    )
    # intervals tile: each valid_to equals the next valid_from; the
    # last is open-ended and flagged current
    for a, b in zip(rows, rows[1:]):
        assert a["valid_to"] == b["valid_from"]
        assert not a["is_current"]
    assert rows[-1]["valid_to"] is None and rows[-1]["is_current"]
    # as-of lookup: for every probe ts, the interval value equals the
    # reference "last observation at or before ts" (ties by seq)
    ordered = sorted((t, i, a) for _, t, a, i in data)
    for probe in range(0, 51, 7):
        pt = _ts(probe)
        ref = None
        for t, i, a in ordered:
            if t <= pt:
                ref = a
        hit = [
            r["attr"]
            for r in rows
            if r["valid_from"] <= pt
            and (r["valid_to"] is None or r["valid_to"] > pt)
        ]
        if ref is None:
            assert hit == []
        else:
            assert hit == [ref]


@given(
    st.integers(
        min_value=-(10**37), max_value=10**37
    )
)
@settings(max_examples=200, deadline=None)
def test_sql_int_to_double_matches_python_float(x):
    """The DuckDB limb-split conversion equals Python's correctly-
    rounded int->float for any |x| < 2^85, and stays deterministic
    (engine-identical) beyond — here checked correctly-rounded across
    the full DECIMAL(38) domain via the same split in pure python."""
    import duckdb

    from dimagi_data_platform_spark.functions.num import sql_int_to_double

    got = duckdb.sql(
        f"SELECT {sql_int_to_double(f'CAST({x} AS HUGEINT)')}"
    ).fetchone()[0]
    if abs(x) < 2**85:
        assert got == float(x)
    else:
        # deterministic three-limb reconstruction, fixed association
        a = abs(x)
        hi2, rem = divmod(a, 1 << 64)
        hi, lo = divmod(rem, 1 << 32)
        want = (float(hi2) * float(1 << 64) + float(hi) * float(1 << 32)) + float(lo)
        want = -want if x < 0 else want
        assert got == want


@given(
    recs=st.lists(
        st.fixed_dictionaries(
            {
                "k": st.integers(min_value=-(2**62), max_value=2**62),
                "s": st.text(max_size=40),
                "v": st.one_of(
                    st.none(),
                    st.floats(allow_nan=False, allow_infinity=False),
                ),
                "b": st.booleans(),
            }
        ),
        min_size=0,
        max_size=120,
    ),
    per_block=st.integers(min_value=1, max_value=17),
    split_size=st.integers(min_value=24, max_value=4000),
)
@SET
def test_ocf_split_read_is_partition_invariant(tmp_path, recs, per_block, split_size):
    """PURE-PYTHON property: for ANY record set, block size, and split
    size, concatenating the per-split block decodes reproduces exactly
    the written records — each block decoded once, none dropped, even
    when payloads straddle split boundaries or a split owns no block.
    (The Spark read is these decodes under mapInPandas; the ownership
    rule itself is what this exercises.)"""
    import json as _json

    from dimagi_data_platform_spark.sources.avro_ocf import (
        _decode_split,
        _fields,
        plan_ocf_splits,
        write_ocf,
    )

    schema = _json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "s", "type": "string"},
                {"name": "v", "type": ["null", "double"]},
                {"name": "b", "type": "boolean"},
            ],
        }
    )
    p = str(tmp_path / f"prop_{per_block}_{split_size}.avro")
    write_ocf(p, schema, recs, records_per_block=per_block)
    flds = _fields(_json.loads(schema))
    got = []
    for fp, start, end, sync_hex in plan_ocf_splits(p, schema, split_size):
        got.extend(
            _decode_split(fp, start, end, bytes.fromhex(sync_hex), flds)
        )
    assert got == recs

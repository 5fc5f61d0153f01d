"""Seeded-sample sf10 parity for the HEAVY tail of the scale curve
(VERDICT r10 item 5): the r10 sf10 probe re-timed the headline
operators at 100x the driver default but asserted correctness there
only by "the plan didn't change" plus sf1 parity. This closes the same
induction gap one decade up, with the r10 seeded-sample protocol
(tools/sampled_sf1_parity.py): the Spark engine runs its NORMAL full
plan at sf10 and the comparison restricts both sides to the same
deterministic md5-selected subset, so the DuckDB oracle's cost
collapses while the engine's sf10 behavior is the thing verified.
Exact value compare (tests/parity.compare), no tolerance.

Covered queries (the heaviest probe entries per SCALE_CURVE_SF10.json
wall times, plus the r11-changed operators — 8 total, all hash_ok in
the committed SAMPLED_SF10_PARITY.json):

- part_k_core / part_pagerank: output is a bounded top-k, so the
  compare is FULL — the oracle replays the complete unrolled
  recurrence over the sf10 co-purchase graph (linear per round,
  MATERIALIZED per round).
- simhash_dedup: pairs whose id_a satisfies md5(id||'#sh42')%199==0
  (~0.5% of docs); the oracle builds ALL fingerprints (linear) and
  joins sample x corpus instead of corpus².
- part_catalog_near_dups_capped: pairs whose part_a satisfies
  md5(k||'#cat42')%199==0. Candidates and the MASS COLUMNS stay
  GLOBAL (compared_pairs is a count over the full candidate union —
  cheap); only the per-pair Jaccard verify is restricted.
- substring_dedup_clean: docs with md5(doc_id||'#sub42')%101==0. The
  gram/first-occurrence CTEs stay GLOBAL (the winner rule is
  cross-doc); coverage expansion and reassembly restrict to sampled
  docs.
- embedding_near_dup_capped (r11 bounded default): pairs whose id_a
  satisfies md5(id||'#enc42')%29==0. Features, all 8 SNM candidate
  passes, and the MASS columns stay GLOBAL (compared/dropped_pairs
  are counts over the full linear candidate union); only the exact
  fold-ordered cosine verify narrows to the sampled pairs.
- ngram_jaccard_pairs (the r10 sf10 broadcast-defect fix, commit
  12985f7): pairs whose doc_a satisfies md5(doc_id||'#ng42')%199==0.
  The capped shingle index and doc sizes stay GLOBAL (the
  MAX_SHINGLE_DF cap is corpus-wide); the pair join restricts its
  smaller-id side to the sample — the engine still runs the FULL
  fixed plan (explicit doc-size broadcast side) at sf10.

Usage:
    python tools/sampled_sf10_parity.py [--sf-dir .artifacts/sf10] \
        [--out SAMPLED_SF10_PARITY.json] [queries...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _md5_mod(col, tag: str, mod: int):
    """The repo's portable md5 selector (identical in DuckDB)."""
    tagged = F.concat(col.cast("string"), F.lit(tag))
    return (
        F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long") % mod
    )


def _md5_mod_sql(expr: str, tag: str, mod: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR) || '{tag}'), 1, 15)) "
        f"AS BIGINT) % {mod}"
    )


def _simhash_sampled_sql() -> str:
    from dimagi_data_platform_spark.plans.oracle import ORACLE

    sql = ORACLE["simhash_dedup"]
    needle = "FROM fp a JOIN fp b ON a.doc_id < b.doc_id"
    assert needle in sql, "simhash oracle shape drifted"
    # materialize fingerprints once (the pair join probes them twice)
    # and restrict the LEFT side to the sample
    return sql.replace(
        "fp AS (SELECT", "fp AS MATERIALIZED (SELECT"
    ).replace(
        needle,
        "FROM (SELECT * FROM fp WHERE "
        + _md5_mod_sql("doc_id", "#sh42", 199)
        + " = 0) a JOIN fp b ON a.doc_id < b.doc_id",
    )


def _catalog_sampled_sql() -> str:
    from dimagi_data_platform_spark.plans.oracle import ORACLE

    sql = ORACLE["part_catalog_near_dups_capped"]
    needle = "FROM cand\nJOIN toks a ON a.p_partkey = cand.ka"
    assert needle in sql, "catalog-capped oracle shape drifted"
    # mass (compared/dropped) is computed over the FULL cand; only the
    # per-pair token verify narrows to the sample
    return sql.replace(
        needle,
        "FROM (SELECT * FROM cand WHERE "
        + _md5_mod_sql("ka", "#cat42", 199)
        + " = 0) cand\nJOIN toks a ON a.p_partkey = cand.ka",
    )


def _substring_sampled_sql() -> str:
    from dimagi_data_platform_spark.plans.oracle import ORACLE

    sql = ORACLE["substring_dedup_clean"]
    sample = _md5_mod_sql("doc_id", "#sub42", 101)
    # gram index + first-occurrence (g, f) stay global — the winner
    # rule is cross-doc; everything that only feeds sampled docs'
    # output narrows: dup coverage, token reassembly, final projection
    needle_dup = "WHERE g.doc_id * 1048576 + g.pos <> f.first_pk"
    assert needle_dup in sql, "substring oracle shape drifted (dup)"
    sql = sql.replace(
        needle_dup,
        f"WHERE {_md5_mod_sql('g.doc_id', '#sub42', 101)} = 0 "
        "AND g.doc_id * 1048576 + g.pos <> f.first_pk",
    )
    needle_ts = "ts AS (\n  SELECT doc_id, u.i AS pos, toks[u.i] AS tok\n  FROM t,"
    assert needle_ts in sql, "substring oracle shape drifted (ts)"
    sql = sql.replace(
        needle_ts,
        "ts AS (\n  SELECT doc_id, u.i AS pos, toks[u.i] AS tok\n"
        f"  FROM (SELECT * FROM t WHERE {sample} = 0) t,",
    )
    needle_out = "FROM t LEFT JOIN cl USING (doc_id)"
    assert needle_out in sql, "substring oracle shape drifted (out)"
    return sql.replace(
        needle_out,
        f"FROM (SELECT * FROM t WHERE {sample} = 0) t "
        "LEFT JOIN cl USING (doc_id)",
    )


def _emb_capped_sampled_sql() -> str:
    from dimagi_data_platform_spark.plans.oracle import ORACLE

    sql = ORACLE["embedding_near_dup_capped"]
    needle = (
        "p AS (\n"
        "  SELECT cand.id_a, cand.id_b, a.vec AS vec_a, b.vec AS vec_b\n"
        "  FROM cand JOIN e a ON a.id = cand.id_a"
    )
    assert needle in sql, "embedding_near_dup_capped oracle shape drifted"
    # mass stays over the FULL cand (the kernel's honest-cap counts);
    # only the exact cosine verify narrows to the sampled pairs
    return sql.replace(
        needle,
        "p AS (\n"
        "  SELECT cand.id_a, cand.id_b, a.vec AS vec_a, b.vec AS vec_b\n"
        "  FROM (SELECT * FROM cand WHERE "
        + _md5_mod_sql("id_a", "#enc42", 29)
        + " = 0) cand JOIN e a ON a.id = cand.id_a",
    )


def _minhash_sampled_sql() -> str:
    from dimagi_data_platform_spark.plans.oracle import ORACLE

    sql = ORACLE["minhash_lsh_dedup"]
    needle = "FROM sig a JOIN sig b ON a.doc_id < b.doc_id"
    assert needle in sql, "minhash oracle shape drifted"
    # signatures stay global (linear); only the banded pair join's
    # smaller-id side narrows to the sample
    return sql.replace(
        "sig AS (SELECT", "sig AS MATERIALIZED (SELECT"
    ).replace(
        needle,
        "FROM (SELECT * FROM sig WHERE "
        + _md5_mod_sql("doc_id", "#mh42", 199)
        + " = 0) a JOIN sig b ON a.doc_id < b.doc_id",
    )


def _ngram_sampled_sql() -> str:
    from dimagi_data_platform_spark.plans.oracle import ORACLE

    sql = ORACLE["ngram_jaccard_pairs"]
    needle = (
        "FROM sh a JOIN sh b USING (shingle)\n  WHERE a.doc_id < b.doc_id"
    )
    assert needle in sql, "ngram_jaccard_pairs oracle shape drifted"
    # the shingle index (with its corpus-wide DF cap) and the size
    # table stay GLOBAL; only the pair join's smaller-id side narrows
    return sql.replace(
        needle,
        "FROM (SELECT * FROM sh WHERE "
        + _md5_mod_sql("doc_id", "#ng42", 199)
        + " = 0) a JOIN sh b USING (shingle)\n  WHERE a.doc_id < b.doc_id",
    )


def _split_ctes(sql: str):
    """Split a generated ``WITH a AS (...), b AS (...) SELECT ...``
    oracle into ordered (name, body) pairs plus the final SELECT, by
    paren-depth walk (quote-aware). Used to run the unrolled-recurrence
    oracles STEPWISE: the SQL text of every step is byte-identical to
    the registered oracle's CTE body — only the execution is staged."""
    import re

    head = sql.index("WITH")
    s = sql[head + 4 :]
    ctes = []
    i = 0
    while True:
        m = re.match(r"\s*([A-Za-z_0-9]+)\s+AS\s+(?:MATERIALIZED\s+)?\(", s[i:])
        assert m, f"oracle CTE parse failed near: {s[i:i+80]!r}"
        name = m.group(1)
        j = i + m.end()
        depth, k, quote = 1, j, None
        while depth:
            c = s[k]
            if quote:
                if c == quote:
                    quote = None
            elif c in ("'", '"'):
                quote = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        ctes.append((name, s[j : k - 1]))
        t = re.match(r"\s*,", s[k:])
        if not t:
            return ctes, s[k:]
        i = k + t.end()


def _run_stepwise(con, sql: str):
    """Execute an unrolled-recurrence oracle one CTE at a time via
    temp tables, dropping each table once no remaining step references
    it — the 20-round pagerank / 6-round k-core unrolls pin >64 GB as
    ONE plan at sf10 but fit easily one round at a time."""
    import re

    ctes, final = _split_ctes(sql)
    remaining = [b for _, b in ctes] + [final]
    for idx, (name, body) in enumerate(ctes):
        con.execute(f'CREATE OR REPLACE TEMP TABLE "{name}" AS {body}')
        tail = remaining[idx + 1 :]
        for prev, _ in ctes[: idx + 1]:
            if not any(re.search(rf"\b{prev}\b", t) for t in tail):
                con.execute(f'DROP TABLE IF EXISTS "{prev}"')
    odf = con.execute(final).fetchdf()
    for name, _ in ctes:
        con.execute(f'DROP TABLE IF EXISTS "{name}"')
    return odf


# unrolled-recurrence oracles whose single-plan execution pins more
# memory than the host allows at sf10 — run stepwise by construction
STEPWISE = {"part_pagerank", "part_k_core"}


def sampled_checks(spark, sf_dir: str) -> dict[str, tuple]:
    """{query: (spark_df_subset, oracle_sql_subset, sample_desc)}."""
    from dimagi_data_platform_spark.plans.oracle import ORACLE
    from dimagi_data_platform_spark.plans.queries import QUERIES

    return {
        "part_k_core": (
            QUERIES["part_k_core"](spark, sf_dir),
            ORACLE["part_k_core"],
            "FULL top-50 compare (bounded output; full unrolled oracle)",
        ),
        "part_pagerank": (
            QUERIES["part_pagerank"](spark, sf_dir),
            ORACLE["part_pagerank"],
            "FULL top-20 compare (bounded output; full unrolled oracle)",
        ),
        "simhash_dedup": (
            QUERIES["simhash_dedup"](spark, sf_dir).filter(
                _md5_mod(F.col("id_a"), "#sh42", 199) == 0
            ),
            _simhash_sampled_sql(),
            "pairs whose id_a is md5-sampled (~0.5% of docs); "
            "fingerprints global",
        ),
        "part_catalog_near_dups_capped": (
            QUERIES["part_catalog_near_dups_capped"](spark, sf_dir).filter(
                _md5_mod(F.col("part_a"), "#cat42", 199) == 0
            ),
            _catalog_sampled_sql(),
            "pairs whose part_a is md5-sampled (~0.5%); candidates and "
            "mass columns global",
        ),
        "substring_dedup_clean": (
            QUERIES["substring_dedup_clean"](spark, sf_dir).filter(
                _md5_mod(F.col("doc_id"), "#sub42", 101) == 0
            ),
            _substring_sampled_sql(),
            "docs md5-sampled (~1%); gram index + first-occurrence "
            "winners global",
        ),
        "embedding_near_dup_capped": (
            QUERIES["embedding_near_dup_capped"](spark, sf_dir).filter(
                _md5_mod(F.col("id_a"), "#enc42", 29) == 0
            ),
            _emb_capped_sampled_sql(),
            "pairs whose id_a is md5-sampled (~3.4%); features, SNM "
            "candidates and mass columns global",
        ),
        "ngram_jaccard_pairs": (
            QUERIES["ngram_jaccard_pairs"](spark, sf_dir).filter(
                _md5_mod(F.col("doc_a"), "#ng42", 199) == 0
            ),
            _ngram_sampled_sql(),
            "pairs whose doc_a is md5-sampled (~0.5%); capped shingle "
            "index + doc sizes global; engine runs the full fixed plan",
        ),
        "minhash_lsh_dedup": (
            QUERIES["minhash_lsh_dedup"](spark, sf_dir).filter(
                _md5_mod(F.col("id_a"), "#mh42", 199) == 0
            ),
            _minhash_sampled_sql(),
            "pairs whose id_a is md5-sampled (~0.5%); signatures "
            "global; engine runs the full banded plan",
        ),
    }


def _spark_phase(sf_dir: str, queries: list[str], pickle_path: str) -> None:
    """Collect every Spark result and pickle them — run in a CHILD
    process so the 48 GB pre-touched JVM (which outlives spark.stop();
    the py4j gateway keeps the process) is fully released before the
    oracle phase. The sf10 k-core oracle needs >52 GB of pinned
    working memory even with spill, and the host kills any process
    near ~73 GB — the two phases cannot share the machine."""
    from dimagi_data_platform_spark.session import get_spark

    spark = get_spark("sampled-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    spark_out: dict[str, tuple] = {}
    for name, (sdf_q, sql, desc) in sampled_checks(spark, sf_dir).items():
        if queries and name not in queries:
            continue
        t0 = time.time()
        sdf = sdf_q.toPandas()
        t_spark = round(time.time() - t0, 3)
        print(json.dumps({"query": name, "t_spark": t_spark}), flush=True)
        spark_out[name] = (sdf, sql, desc, t_spark)
    import pickle

    with open(pickle_path, "wb") as f:
        pickle.dump(spark_out, f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".artifacts", "sf10"))
    ap.add_argument(
        "--out", default=os.path.join(REPO, "SAMPLED_SF10_PARITY.json")
    )
    ap.add_argument("--spark-phase-pickle", default="", help=argparse.SUPPRESS)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    if args.spark_phase_pickle:
        _spark_phase(args.sf_dir, args.queries, args.spark_phase_pickle)
        return

    import pickle
    import subprocess

    work = os.path.join(REPO, ".artifacts")
    os.makedirs(work, exist_ok=True)
    pkl = os.path.join(work, "sampled_sf10_spark.pkl")
    subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--sf-dir", args.sf_dir, "--spark-phase-pickle", pkl,
         *args.queries],
        check=True,
    )
    with open(pkl, "rb") as f:
        spark_out = pickle.load(f)

    from tests.parity import compare, duck_con

    con = duck_con(args.sf_dir)
    tmp = os.path.join(REPO, ".artifacts", "duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute(
        f"SET memory_limit='{os.environ.get('DUCK_MEM_LIMIT', '64GB')}'"
    )
    # per-thread operator state is the pinned (unspillable) part —
    # fewer threads keeps the k-core unroll under the cap
    con.execute(f"SET threads={int(os.environ.get('DUCK_THREADS', '8'))}")
    con.execute("SET preserve_insertion_order=false")
    results: dict[str, dict] = {}
    # cheapest-oracle-first (k-core last): partial results persist
    # per-query, so a memory abort in the heaviest oracle keeps the
    # others' evidence on disk
    order = sorted(
        spark_out, key=lambda n: (n == "part_k_core", n == "part_pagerank")
    )
    for name in order:
        sdf, sql, desc, t_spark = spark_out[name]
        t0 = time.time()
        if name in STEPWISE:
            odf = _run_stepwise(con, sql)
        else:
            odf = con.execute(sql).fetchdf()
        t_oracle = round(time.time() - t0, 3)
        errs = compare(sdf, odf)
        results[name] = {
            "status": "hash_ok" if not errs else f"FAIL {errs[:3]}",
            "n_rows": len(sdf),
            "sample": desc,
            "t_spark": t_spark,
            "t_oracle": t_oracle,
        }
        print(json.dumps({"query": name, **results[name]}), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()

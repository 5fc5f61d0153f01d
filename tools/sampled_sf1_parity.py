"""Seeded-sample sf1 parity for the quadratic-oracle timeouts
(VERDICT r9 item 3): the six queries whose DuckDB oracles are
infeasible at sf1 (pair-quadratic enumeration / 6k-deep recursion on a
single node) get a DETERMINISTIC md5-selected subset check at sf1 —
the Spark engine runs its NORMAL full plan and the comparison
restricts both sides to the same seeded subset, so the oracle's cost
collapses while the engine's sf1 behavior is still the thing being
verified. Exact value compare (tests/parity.compare), no tolerance.

Subsets per query (documented in the emitted artifact):

- co_purchase_triangles / copurchase_clustering: per-part triangle
  counts (the statistic under the top-20 projection) for parts with
  md5(p || '#tri42') % 101 == 0 (~1%); the oracle enumerates wedges
  ONLY around sampled centers (cost Σ deg² over the sample).
- customer_fuzzy_match: pairs whose SMALLER key satisfies
  md5(k || '#fz42') % 199 == 0 (~0.5%); the oracle scans sample×block.
- embedding_near_dup: pairs whose id_a satisfies
  md5(id || '#nd42') % 199 == 0; oracle cost sample×n×64.
- pack_training_sequences / training_data_manifest: the FIRST 1500
  rows (in the packing's own (h, doc_id) order) of shard 3 — a PREFIX
  of a first-fit pack stream is itself the pack stream, so bounding
  the recursion depth changes nothing about the verified rows; the
  manifest keeps its full upstream CTE chain (quality → dedup →
  decontaminate run GLOBALLY in the oracle) and truncates only the
  recursion.

Usage:
    python tools/sampled_sf1_parity.py [--sf-dir .artifacts/sf1] \
        [--out SAMPLED_SF1_PARITY.json] [--patch-sweep SF1_SWEEP.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACK_PREFIX = 1500
PACK_SHARD = 3


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


# shared oracle scaffolding: the co-purchase edge set (identical to the
# full oracles') + per-sampled-center triangle counts
_EDGE_CTES = """
lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
adj AS MATERIALIZED (
  SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
deg AS MATERIALIZED (SELECT a AS p, COUNT(*) AS deg FROM adj GROUP BY a)
"""

_TRI_SAMPLE_CTES = (
    _EDGE_CTES
    + f""",
sample AS (SELECT p FROM deg WHERE {_md5_mod_sql('p', '#tri42', 101)} = 0),
tri_p AS (
  SELECT s.p, COUNT(*) AS n_triangles
  FROM sample s
  JOIN adj n1 ON n1.a = s.p
  JOIN adj n2 ON n2.a = s.p AND n1.b < n2.b
  JOIN e ON e.u = n1.b AND e.v = n2.b
  GROUP BY s.p)
"""
)


def _capped_sampled_sqls() -> tuple[str, str]:
    """Sampled-oracle SQL for (embedding_near_dup_capped,
    embedding_near_dup_recall_eval): reuse the full oracle's CTE chain
    (fb/e/ranks — linear, the cheap part) but generate CANDIDATES only
    around sampled ids: per ordering, sampled rows join their ±W rank
    neighborhood, and a pair survives iff its LEAST id is sampled —
    exactly the pairs the engine-side filter keeps, because a pair
    (x,y) with min(x,y)=x sampled is within W of x in some ordering
    and the ±W join from x emits it regardless of which side of x's
    rank y sits on. The cosine verify then touches ~|sample|·2W·16
    pairs instead of n·W·16, and the exact true-pair scan collapses
    from n²/2 to |sample|·n."""
    from dimagi_data_platform_spark.plans.oracle import (
        _CAPPED_RANKS,
        _CAPPED_T,
        _COS_AB,
        _FB,
        _FB_CTE,
        _PROBE_T,
        _SNM_W,
        _CAPPED_COLS,
    )

    sel = _md5_mod_sql("id", "#nd42", 199)
    orders = [f"r{t}" for t in range(_CAPPED_T)] + [
        f"pr{t}" for t in range(_PROBE_T)
    ]
    passes = "\nUNION\n".join(
        f"""SELECT LEAST(a.id, b.id) AS id_a, GREATEST(a.id, b.id) AS id_b
  FROM (SELECT r.id, r.rn FROM {o} r JOIN sid USING (id)) a
  JOIN {o} b ON b.rn BETWEEN a.rn - {_SNM_W} AND a.rn + {_SNM_W}
            AND b.rn <> a.rn"""
        for o in orders
    )
    shared = f"""
WITH {_FB_CTE},
e AS MATERIALIZED (
  SELECT vec_id AS id, embedding AS vec,
         {_CAPPED_COLS}
  FROM embeddings),
{_CAPPED_RANKS},
sid AS MATERIALIZED (SELECT id FROM e WHERE {sel} = 0),
cand AS MATERIALIZED (
  SELECT id_a, id_b FROM (
  {passes})
  WHERE id_a IN (SELECT id FROM sid)),
p AS (
  SELECT cand.id_a, cand.id_b, a.vec AS vec_a, b.vec AS vec_b
  FROM cand JOIN e a ON a.id = cand.id_a JOIN e b ON b.id = cand.id_b),
s AS (SELECT id_a, id_b, {_COS_AB} AS cos_sim FROM p)"""
    capped_sql = (
        shared
        + "\nSELECT id_a, id_b, cos_sim FROM s WHERE cos_sim >= 0.35"
    )
    recall_sql = (
        shared
        + f""",
ex AS (
  SELECT a.vec AS vec_a, b.vec AS vec_b
  FROM (SELECT e.id, e.vec FROM e JOIN sid USING (id)) a
  JOIN e b ON a.id < b.id),
met AS (
  SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_vectors,
         CAST({_SNM_W} AS BIGINT) AS window_used,
         CAST({_FB} AS BIGINT) AS probe_bits_used,
         CAST((SELECT COUNT(*) FROM ex WHERE {_COS_AB} >= 0.35) AS BIGINT)
           AS true_pairs,
         CAST((SELECT COUNT(*) FROM s WHERE cos_sim >= 0.35) AS BIGINT)
           AS found_pairs)
SELECT n_vectors, window_used, probe_bits_used, true_pairs, found_pairs,
       CASE WHEN true_pairs > 0
            THEN CAST(found_pairs AS DOUBLE) / CAST(true_pairs AS DOUBLE)
       END AS recall
FROM met"""
    )
    return capped_sql, recall_sql


def sampled_checks(spark, sf_dir: str) -> dict[str, tuple]:
    """{query: (spark_df_subset, oracle_sql_subset, sample_desc)}."""
    from dimagi_data_platform_spark.operators.packing import _portable_hash
    from dimagi_data_platform_spark.plans.queries import (
        QUERIES,
        _copurchase_tri,
    )

    deg, corners = _copurchase_tri(spark, sf_dir)
    tri_sample = _md5_mod(F.col("p"), "#tri42", 101) == 0
    tri_counts = (
        corners.groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .filter(tri_sample)
        .select(F.col("p").alias("p_partkey"), "n_triangles")
    )
    clustering = (
        deg.filter(F.col("deg") >= 2)
        .join(
            corners.groupBy("p").agg(
                F.count(F.lit(1)).cast("long").alias("n_triangles")
            ),
            "p",
            "left",
        )
        .filter(tri_sample)
        .select(
            F.col("p").alias("p_partkey"),
            F.col("deg").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            (
                (F.coalesce("n_triangles", F.lit(0)) * 2).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)).cast("double")
            ).alias("clustering_coeff"),
        )
    )
    fuzzy = QUERIES["customer_fuzzy_match"](spark, sf_dir).filter(
        _md5_mod(F.col("custkey_a"), "#fz42", 199) == 0
    )
    near_dup = QUERIES["embedding_near_dup"](spark, sf_dir).filter(
        _md5_mod(F.col("id_a"), "#nd42", 199) == 0
    )

    def _pack_prefix(df):
        h = _portable_hash("doc_id", "#shard42")
        w = Window.partitionBy("shard").orderBy("h", "doc_id")
        return (
            df.filter(F.col("shard") == PACK_SHARD)
            .withColumn("h", h)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= PACK_PREFIX)
            .select("doc_id", "shard", "pack_id", "n_tokens")
        )

    pack = _pack_prefix(QUERIES["pack_training_sequences"](spark, sf_dir))
    manifest = _pack_prefix(QUERIES["training_data_manifest"](spark, sf_dir))

    # VERDICT r13 item 2: the two r13 sf1 oracle_timeout entries.
    # The engine runs its NORMAL full plans; the comparison restricts
    # pairs to sampled id_a (same '#nd42' selector as the exact
    # sibling) and omits the compared_pairs/dropped_pairs scalar
    # columns — their value requires the FULL 16-pass candidate-set
    # dedup that (with the 64-dim verify payload) is exactly what
    # spills DuckDB to death at sf1 (>70 GB, ENOSPC measured r14);
    # both columns are driver-hash-checked at sf0.001/0.01/0.1.
    from dimagi_data_platform_spark.operators.similarity import (
        adaptive_bucket_bits,
        adaptive_snm_window,
        embedding_near_dup_capped,
        embedding_near_dup_pairs,
    )
    from dimagi_data_platform_spark.plans.queries import (
        EMBED_NEAR_DUP_THRESHOLD,
        _t,
    )

    nd_sel = _md5_mod(F.col("id_a"), "#nd42", 199) == 0
    capped_s = (
        QUERIES["embedding_near_dup_capped"](spark, sf_dir)
        .filter(nd_sel)
        .drop("compared_pairs", "dropped_pairs")
    )

    emb = _t(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    w_used = adaptive_snm_window(n_corpus)
    pb_used = adaptive_bucket_bits(n_corpus)
    cap_pairs = embedding_near_dup_capped(
        emb, EMBED_NEAR_DUP_THRESHOLD
    ).filter(nd_sel)
    ex_pairs = embedding_near_dup_pairs(
        emb, EMBED_NEAR_DUP_THRESHOLD
    ).filter(nd_sel)
    recall_s = (
        emb.agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .crossJoin(
            F.broadcast(
                ex_pairs.agg(
                    F.count(F.lit(1)).cast("long").alias("true_pairs")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                cap_pairs.agg(
                    F.count(F.lit(1)).cast("long").alias("found_pairs")
                )
            )
        )
        .select(
            "n_vectors",
            F.lit(w_used).cast("long").alias("window_used"),
            F.lit(pb_used).cast("long").alias("probe_bits_used"),
            "true_pairs",
            "found_pairs",
            F.when(
                F.col("true_pairs") > 0,
                F.col("found_pairs").cast("double")
                / F.col("true_pairs").cast("double"),
            ).alias("recall"),
        )
    )

    from dimagi_data_platform_spark.plans.oracle import ORACLE

    def _prefix_oracle(full_sql: str) -> str:
        """Restrict the packing recursion to shard PACK_SHARD's first
        PACK_PREFIX rows by tightening the `ordered` CTE the recursion
        walks (prefix-closure of first-fit packing)."""
        needle = "         ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS rn\n  FROM base)"
        assert needle in full_sql, "packing oracle shape drifted"
        # ordered_pref is MATERIALIZED: the recursive CTE walks it once
        # per step, and an inlined definition would re-evaluate the
        # whole upstream chain at every iteration (measured 65 s at
        # sf0.1 vs ~1 s materialized)
        return full_sql.replace(
            needle,
            needle[: -len(")")]
            + f" WHERE h % 8 = {PACK_SHARD}) , ordered_pref AS MATERIALIZED "
            f"(SELECT * FROM ordered WHERE rn <= {PACK_PREFIX})",
        ).replace("JOIN ordered o", "JOIN ordered_pref o").replace(
            "FROM ordered WHERE rn = 1", "FROM ordered_pref WHERE rn = 1"
        )

    def _manifest_shard_oracle(full_sql: str) -> str:
        """Prefix-truncate the packing AND cut the shingle
        decontamination scan (the dominant cost) to shard PACK_SHARD's
        dedup survivors: quality/dedup stay GLOBAL (dedup's winner rule
        is cross-shard), but `contaminated` is only ever consulted for
        kept docs, and the verified prefix contains only shard-3 docs —
        so restricting the expensive unnest to h%8==3 dedup rows leaves
        every verified row's classification unchanged."""
        shard_h = (
            "CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || "
            "'#shard42'), 1, 15)) AS BIGINT)"
        )
        needle = "  FROM dedup d JOIN toks_all ta ON ta.doc_id = d.doc_id,"
        assert needle in full_sql, "manifest oracle shape drifted"
        out = full_sql.replace(
            needle,
            "  FROM (SELECT doc_id FROM dedup d WHERE "
            f"{shard_h} % 8 = {PACK_SHARD}) d "
            "JOIN toks_all ta ON ta.doc_id = d.doc_id,",
        )
        return _prefix_oracle(out)

    checks = {
        "co_purchase_triangles": (
            tri_counts,
            f"WITH {_TRI_SAMPLE_CTES} "
            "SELECT p AS p_partkey, CAST(n_triangles AS BIGINT) AS n_triangles "
            "FROM tri_p",
            "per-part triangle counts, md5(p||'#tri42')%101==0 (~1% of parts)",
        ),
        "copurchase_clustering": (
            clustering,
            f"WITH {_TRI_SAMPLE_CTES} "
            "SELECT d.p AS p_partkey, CAST(d.deg AS BIGINT) AS degree, "
            "CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles, "
            "CAST(2.0 * COALESCE(t.n_triangles, 0) AS DOUBLE) "
            "/ (d.deg * (d.deg - 1)) AS clustering_coeff "
            "FROM deg d LEFT JOIN tri_p t ON t.p = d.p "
            f"WHERE d.deg >= 2 AND {_md5_mod_sql('d.p', '#tri42', 101)} = 0",
            "per-part clustering coefficients on the same ~1% part sample",
        ),
        "customer_fuzzy_match": (
            fuzzy,
            "SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b, "
            "CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist "
            "FROM customer a JOIN customer b "
            "ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey "
            f"WHERE {_md5_mod_sql('a.c_custkey', '#fz42', 199)} = 0 "
            "AND levenshtein(a.c_name, b.c_name) <= 2",
            "pairs whose smaller custkey is md5-sampled (~0.5% of customers)",
        ),
        "embedding_near_dup": (
            near_dup,
            "WITH sa AS (SELECT vec_id, embedding FROM embeddings "
            f"WHERE {_md5_mod_sql('vec_id', '#nd42', 199)} = 0) "
            + ORACLE["embedding_near_dup"]
            .replace("FROM embeddings a JOIN", "FROM sa a JOIN")
            .replace("WITH p AS", ", p AS")
            .lstrip(),
            "pairs whose id_a is md5-sampled (~0.5% of vectors)",
        ),
        "embedding_near_dup_capped": (
            capped_s,
            _capped_sampled_sqls()[0],
            "pairs whose id_a is md5-sampled (~0.5%); mass columns "
            "omitted (their full candidate-set dedup is the part that "
            "spills DuckDB at sf1; both driver-hash-checked ≤ sf0.1)",
        ),
        "embedding_near_dup_recall_eval": (
            recall_s,
            _capped_sampled_sqls()[1],
            "summary row on the sampled-id_a pair universe: exact scan "
            "|sample|·n instead of n²/2; same engine plans, mass "
            "columns omitted",
        ),
        "pack_training_sequences": (
            pack,
            _prefix_oracle(ORACLE["pack_training_sequences"]),
            f"first {PACK_PREFIX} rows of shard {PACK_SHARD} "
            "(prefix-closure of first-fit packing)",
        ),
        "training_data_manifest": (
            manifest,
            _manifest_shard_oracle(ORACLE["training_data_manifest"]),
            "upstream pipeline (dedup global; the quadratic shingle "
            f"decontamination scan restricted to shard {PACK_SHARD}'s "
            f"dedup survivors — the only docs the verified prefix can "
            f"contain), packing prefix: first {PACK_PREFIX} rows of "
            f"shard {PACK_SHARD}",
        ),
    }
    return checks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".artifacts", "sf1"))
    ap.add_argument("--out", default=os.path.join(REPO, "SAMPLED_SF1_PARITY.json"))
    ap.add_argument("--patch-sweep", default=os.path.join(REPO, "SF1_SWEEP.json"))
    ap.add_argument(
        "--patch-only",
        action="store_true",
        help="merge an existing --out artifact into --patch-sweep "
        "without re-running the checks (after a fresh sweep rewrite)",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    if args.patch_only:
        with open(args.out) as f:
            results = json.load(f)
        _patch_sweep(args.patch_sweep, results)
        print(f"patched {args.patch_sweep} from {args.out}")
        return

    from dimagi_data_platform_spark.session import get_spark
    from tests.parity import compare, duck_con

    spark = get_spark("sampled-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(args.sf_dir)
    results: dict[str, dict] = {}
    for name, (sdf_q, sql, desc) in sampled_checks(spark, args.sf_dir).items():
        if args.queries and name not in args.queries:
            continue
        t0 = time.time()
        sdf = sdf_q.toPandas()
        t_spark = round(time.time() - t0, 3)
        t0 = time.time()
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
        print(json.dumps({"query": name, **results[name]}))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    if args.patch_sweep and os.path.exists(args.patch_sweep) and not args.queries:
        _patch_sweep(args.patch_sweep, results)


def _patch_sweep(sweep_path: str, results: dict) -> None:
    with open(sweep_path) as f:
        sweep = json.load(f)
    for name, r in results.items():
        if name in sweep.get("queries", {}):
            sweep["queries"][name]["sampled_sf1"] = (
                f"{r['status']} ({r['n_rows']} rows; {r['sample']})"
            )
    sweep.setdefault("summary", {})["sampled_sf1_parity"] = {
        n: r["status"] for n, r in results.items()
    }
    with open(sweep_path, "w") as f:
        json.dump(sweep, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()

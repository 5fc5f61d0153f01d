"""Error-bound / property tests for the approximate operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from dimagi_data_platform_spark.catalog import load_table
from dimagi_data_platform_spark.operators.fingerprint import (
    shared_fingerprint_pairs,
    winnow_fingerprints,
)
from dimagi_data_platform_spark.operators.sketches import (
    approx_distinct_by,
    approx_percentiles_by,
)
from dimagi_data_platform_spark.functions.text import tokens
from tests.conftest import SF_MED, SF_SMALL


def test_approx_count_distinct_within_rsd(spark):
    orders = load_table(spark, SF_MED, "orders").withColumn(
        "month", F.date_trunc("month", "o_orderdate")
    )
    approx = {
        r.month: r.approx_distinct_o_custkey
        for r in approx_distinct_by(orders, ["month"], "o_custkey").collect()
    }
    exact = {
        r.month: r.n
        for r in orders.groupBy("month")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for m, n in exact.items():
        assert abs(approx[m] - n) <= max(3, 0.1 * n), (m, approx[m], n)


def test_approx_percentiles_close_to_exact(spark):
    orders = load_table(spark, SF_MED, "orders")
    approx = {
        r.o_orderpriority: (r.p50, r.p90, r.p99)
        for r in approx_percentiles_by(orders, ["o_orderpriority"], "o_totalprice").collect()
    }
    exact = {
        r.o_orderpriority: (r.p50, r.p90, r.p99)
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
            F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    for k, (a50, a90, a99) in approx.items():
        e50, e90, e99 = exact[k]
        assert abs(a50 - e50) / e50 < 0.05
        assert abs(a90 - e90) / e90 < 0.05
        assert abs(a99 - e99) / e99 < 0.05


def test_winnow_identical_docs_share_all_fingerprints(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    fps = winnow_fingerprints(docs)
    a = {r.fingerprint for r in fps.filter(F.col("doc_id") == 1).collect()}
    b = {r.fingerprint for r in fps.filter(F.col("doc_id") == 2).collect()}
    assert a and a == b


def test_winnow_detects_shared_run(spark):
    shared_run = "one two three four five six seven eight nine ten eleven twelve"
    docs = spark.createDataFrame(
        [
            (1, f"prefix unique words here {shared_run} and a tail"),
            (2, f"{shared_run} totally different ending content words"),
            (3, "no overlap with anything else at all in this document body"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b) for r in shared_fingerprint_pairs(docs, min_shared=2).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_winnow_short_doc_single_fingerprint(spark):
    docs = spark.createDataFrame([(1, "just four words here")], "doc_id long, text string")
    fps = winnow_fingerprints(docs).collect()
    assert len(fps) >= 1  # shorter than window → one min fingerprint


def test_heavy_hitters_underestimates_within_bound(spark):
    from dimagi_data_platform_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, SF_SMALL, "documents")
    terms = docs.select(F.explode(tokens("text")).alias("term"))
    n_total = terms.count()
    capacity = 64
    exact = {
        r.term: r.n
        for r in terms.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    est = {
        r.term: r.est_count
        for r in heavy_hitters(terms, "term", capacity, capacity).collect()
    }
    assert est, "summary is empty"
    n_parts = terms.rdd.getNumPartitions()
    bound = (n_total // capacity) + n_parts  # merged per-partition error
    for term, e in est.items():
        assert e <= exact[term], f"{term}: estimate {e} above true {exact[term]}"
        assert exact[term] - e <= bound, f"{term}: error above bound"
    # every term well above the error bound must be present
    for term, true_n in exact.items():
        if true_n > 2 * bound:
            assert term in est, f"hot term {term} missing from summary"


def test_segment_distinct_union_estimates_within_hll_error(spark):
    """Merged per-nation sketches must estimate segment-level distinct
    customers within HLL error of the exact count — merging sketches
    must not degrade the estimate beyond the sketch's own guarantee."""
    from dimagi_data_platform_spark.catalog import load_table
    from dimagi_data_platform_spark.plans.queries import QUERIES
    from tests.conftest import SF_MED

    got = {
        r.c_mktsegment: r.approx_customers
        for r in QUERIES["segment_distinct_union"](spark, SF_MED).collect()
    }
    cust = load_table(spark, SF_MED, "customer")
    exact = {
        r.c_mktsegment: r.n
        for r in cust.groupBy("c_mktsegment")
        .agg(F.count_distinct("c_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for seg, est in got.items():
        assert abs(est - exact[seg]) / exact[seg] < 0.05, (seg, est, exact[seg])


def test_cms_estimates_one_sided_and_bounded(spark):
    """CMS invariants on real token data: (a) every estimate is >= the
    true count (one-sided by construction), (b) for this fixed seed and
    width the overestimate stays within the eps*N analysis bound, and
    (c) a sketch built from per-partition unions equals the all-at-once
    sketch (mergeability = cell-wise addition)."""
    from dimagi_data_platform_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    terms = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    n_total = terms.count()
    width, depth = 1024, 4
    sketch = cms_build(terms, "term", width=width, depth=depth)
    exact = terms.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    top = exact.orderBy(F.desc("true_count"), "term").limit(30)
    est = cms_estimate(sketch, top.select("term"), "term", width=width, depth=depth)
    joined = {
        r.term: (r.true_count, r.est_count)
        for r in top.join(est, "term").collect()
    }
    assert len(joined) == 30
    for term, (true, e) in joined.items():
        assert e >= true, f"CMS under-estimated {term}: {e} < {true}"
        assert e - true <= 2.0 * n_total / width, (
            f"CMS overshoot beyond bound for {term}: {e} vs {true}"
        )
    # mergeability: sketches of two halves sum cell-wise to the full one
    h1 = cms_build(terms.filter(F.crc32(F.col("term")) % 2 == 0), "term", width=width, depth=depth)
    h2 = cms_build(terms.filter(F.crc32(F.col("term")) % 2 == 1), "term", width=width, depth=depth)
    merged = (
        h1.unionByName(h2)
        .groupBy("row_id", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r.row_id, r.bucket): r.cnt for r in sketch.collect()}
    got = {(r.row_id, r.bucket): r.cnt for r in merged.collect()}
    assert got == full


def test_hll_distinct_eval_error_within_bound(spark):
    """L17c: the deterministic md5-HLL estimate must land within ~4x
    the standard error (1.04/sqrt(256) = 6.5%) of the exact distinct
    count on every month — and the emitted rel_err column must be the
    realized ratio of the two emitted value columns."""
    from dimagi_data_platform_spark.plans.queries import QUERIES

    rows = QUERIES["hll_distinct_eval"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert abs(r.rel_err) <= 4 * 1.04 / 16  # 26% — generous 4-sigma
        assert r.rel_err == r.est_distinct / float(r.exact_distinct) - 1.0


def test_mg_heavy_hitter_eval_bound_holds(spark):
    """L17e: the Frequent-summary guarantee — every emitted estimate
    is a lower bound on the exact count, short by at most the emitted
    Σ-shard-threshold bound."""
    from dimagi_data_platform_spark.plans.queries import QUERIES

    rows = QUERIES["mg_heavy_hitter_eval"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert 0 <= r.underestimate <= r.bound_total
        assert r.est_count + r.underestimate == r.exact_count


def test_quantile_sample_eval_sane(spark):
    """L17d: the hash-sample is ~20% of the rows and the sampled
    median lands within 15% of the exact median at sf0.01."""
    from dimagi_data_platform_spark.plans.queries import QUERIES

    rows = QUERIES["quantile_sample_eval"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert 0.1 <= r.n_sample / r.n_total <= 0.3
        if r.q == 50:
            assert abs(r.rel_err) <= 0.15


def test_hll_union_rollup_merge_identity(spark):
    """L37b: the merged coarse registers must be IDENTICAL to direct
    coarse-grain sketching (max is associative) — the mergeability
    contract itself, plus the estimate's error bound at segment
    grain."""
    from dimagi_data_platform_spark.catalog import load_table
    from dimagi_data_platform_spark.operators.sketches import (
        hll_merge,
        hll_registers,
    )
    from dimagi_data_platform_spark.plans.queries import QUERIES

    cust = load_table(spark, "/root/testdata/sf0.01", "customer")
    fine = hll_registers(cust, ["c_mktsegment", "c_nationkey"], "c_custkey")
    merged = sorted(map(tuple, hll_merge(fine, ["c_mktsegment"]).collect()))
    direct = sorted(map(tuple, hll_registers(
        cust, ["c_mktsegment"], "c_custkey").collect()))
    assert merged == direct
    rows = QUERIES["hll_union_rollup_eval"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        assert r.n_fine_sketches > 1  # a real multi-sketch merge
        assert abs(r.rel_err) <= 4 * 1.04 / 16

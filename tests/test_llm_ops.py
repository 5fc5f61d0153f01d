"""Property tests for the approximate (rows-only) LLM operators:
MinHash/LSH recall vs exact Jaccard, SimHash behavior on known
near-duplicates, LSH-KNN sanity vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from dimagi_data_platform_spark.catalog import load_table
from dimagi_data_platform_spark.operators.minhash import minhash_dedup_pairs
from dimagi_data_platform_spark.operators.simhash import (
    simhash_fingerprints,
    simhash_near_dup_pairs,
)
from dimagi_data_platform_spark.operators.similarity import knn_bruteforce, knn_lsh
from tests.conftest import SF_SMALL

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm stone wall near the garden gate today"
)


def _near_dup_corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE.replace("today", "tonight")),          # near-dup of 1
        (3, BASE),                                      # exact dup of 1
        (4, "completely different content about spark partitions and shuffles in a cluster"),
        (5, "another unrelated document mentioning parquet files and columnar storage formats"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_minhash_finds_near_and_exact_dups(spark):
    docs = _near_dup_corpus(spark)
    pairs = minhash_dedup_pairs(docs, min_est_jaccard=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 3) in got  # exact dup must be found
    assert (1, 2) in got  # one-word-change near dup must be found
    assert (4, 5) not in got  # unrelated docs must not pair at 0.5


def test_minhash_est_jaccard_is_one_for_exact_dup(spark):
    docs = _near_dup_corpus(spark)
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_dedup_pairs(docs, min_est_jaccard=0.1).collect()
    }
    assert pairs[(1, 3)] == 1.0


def test_incremental_lsh_matches_cross_side_only(spark):
    """incremental matches = the full LSH pair set restricted to
    (batch, corpus) pairs: no intra-batch or intra-corpus pairs, and
    every cross-side pair the full run finds is found incrementally."""
    from dimagi_data_platform_spark.operators.minhash import (
        incremental_lsh_matches,
        minhash_signatures,
    )

    docs = _near_dup_corpus(spark)
    sigs = minhash_signatures(docs)
    batch_ids = {2, 4}
    batch = sigs.filter(F.col("doc_id").isin(*batch_ids))
    corpus = sigs.filter(~F.col("doc_id").isin(*batch_ids))
    got = {
        (r.batch_id, r.corpus_id): r.est_jaccard
        for r in incremental_lsh_matches(
            corpus, batch, min_est_jaccard=0.1
        ).collect()
    }
    assert all(b in batch_ids and c not in batch_ids for b, c in got)
    full = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_dedup_pairs(docs, min_est_jaccard=0.1).collect()
    }
    cross = {
        (a if a in batch_ids else b, b if a in batch_ids else a): est
        for (a, b), est in full.items()
        if (a in batch_ids) != (b in batch_ids)
    }
    assert got == cross


def test_signature_table_roundtrip_matches_direct_probe(spark, tmp_path):
    """Persist the corpus signature table, probe it with a batch, and
    get exactly the matches the in-memory path produces."""
    from dimagi_data_platform_spark.operators.minhash import (
        build_signature_table,
        incremental_dedup_from_index,
        incremental_lsh_matches,
        minhash_signatures,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "sig_index")
    build_signature_table(corpus, path)
    got = {
        (r.batch_id, r.corpus_id): r.est_jaccard
        for r in incremental_dedup_from_index(
            spark, path, batch, min_est_jaccard=0.2
        ).collect()
    }
    want = {
        (r.batch_id, r.corpus_id): r.est_jaccard
        for r in incremental_lsh_matches(
            minhash_signatures(corpus),
            minhash_signatures(batch),
            min_est_jaccard=0.2,
        ).collect()
    }
    assert got == want and got


def test_signature_table_collapses_exact_dup_classes(spark, tmp_path):
    """A corpus dominated by one giant exact-dup class must persist to
    a rep table bounded by DISTINCT signatures: per-(band,bucket) entry
    counts stay O(distinct sigs) no matter how duplicated the raw
    corpus is, and a batch probe still reaches every raw member through
    the membership fan-out."""
    from dimagi_data_platform_spark.operators.minhash import (
        _band_entries,
        build_signature_table,
        incremental_dedup_from_index,
    )

    n_dups = 200
    rows = [(i, BASE) for i in range(n_dups)] + [
        (1000, "totally different text about columnar shuffle services"),
        (1001, "yet another unrelated string mentioning adaptive query execution"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id int, text string")
    path = str(tmp_path / "hot_index")
    build_signature_table(corpus, path)

    reps = spark.read.parquet(f"{path}/sigs")
    n_reps = reps.count()
    assert n_reps == 3  # 1 distinct sig for the class + 2 singletons
    max_bucket = (
        _band_entries(reps, "doc_id", 16, 4)
        .groupBy("band", "bucket")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_bucket <= n_reps  # probe work bounded by distinct sigs
    members = spark.read.parquet(f"{path}/members")
    assert members.count() == len(rows)

    batch = spark.createDataFrame([(5000, BASE)], "doc_id int, text string")
    got = {
        r.corpus_id
        for r in incremental_dedup_from_index(
            spark, path, batch, min_est_jaccard=0.9
        ).collect()
    }
    assert got == set(range(n_dups))  # fan-out reaches every raw member


def test_incremental_matches_equal_full_pairs_randomized(spark):
    """Property (seeded-random corpora): incremental_lsh_matches over a
    collapsed rep+membership index == lsh_candidate_pairs restricted to
    (batch, corpus) pairs, for corpora with planted near-dups, exact-dup
    classes, and unrelated noise."""
    import random as _random

    from dimagi_data_platform_spark.operators.minhash import (
        collapse_signatures,
        incremental_lsh_matches,
        minhash_dedup_pairs,
        minhash_signatures,
    )

    words = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    ).split()
    for seed in (7, 23):
        rnd = _random.Random(seed)
        rows = []
        doc_id = 0
        for base in range(6):
            text = " ".join(rnd.choices(words, k=30))
            n_copies = rnd.choice([1, 1, 2, 4])
            for c in range(n_copies):
                t = text
                if c and rnd.random() < 0.5:  # near (not exact) copy
                    t = t.replace(rnd.choice(words), rnd.choice(words))
                rows.append((doc_id, t))
                doc_id += 1
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        batch_ids = {r[0] for r in rows if r[0] % 3 == 0}
        sigs = minhash_signatures(docs).localCheckpoint()
        batch = sigs.filter(F.col("doc_id").isin(*batch_ids))
        reps, members = collapse_signatures(
            sigs.filter(~F.col("doc_id").isin(*batch_ids))
        )
        got = {
            (r.batch_id, r.corpus_id): round(r.est_jaccard, 9)
            for r in incremental_lsh_matches(
                reps, batch, min_est_jaccard=0.2, corpus_members=members
            ).collect()
        }
        full = minhash_dedup_pairs(docs, min_est_jaccard=0.2)
        want = {}
        for r in full.collect():
            a_in, b_in = r.id_a in batch_ids, r.id_b in batch_ids
            if a_in != b_in:
                key = (r.id_a, r.id_b) if a_in else (r.id_b, r.id_a)
                want[key] = round(r.est_jaccard, 9)
        assert got == want, f"seed {seed}: {got.keys() ^ want.keys()}"


def test_semantic_dedup_hot_cluster_sub_blocking(spark):
    """A hot cluster must be sub-blocked: per-task group sizes stay
    bounded by ~2*block_target, and the sub-blocked result is identical
    to the single-group kernel (planted sparse near-dup pairs would
    expose any missed block pair)."""
    import numpy as np

    from dimagi_data_platform_spark.operators.similarity import (
        _block_pair_replicate,
        semantic_dedup,
    )

    rnd = np.random.RandomState(11)
    n, dim = 600, 16
    X = rnd.randn(n, dim).astype("float32")
    # planted near-dups: rows 500..509 copy rows 0..9 (cross-block at
    # any B), everything else is random (cos ~ 0 at dim 16 is unlikely
    # to cross 0.95)
    for i in range(10):
        X[500 + i] = X[i]
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    kw = dict(threshold=0.95, nlist=2, seed=7)
    blocked = semantic_dedup(emb, block_target=64, **kw).toPandas()
    single = semantic_dedup(emb, block_target=10**9, **kw).toPandas()
    for df in (blocked, single):
        df.sort_values("vec_id", inplace=True)
        df.reset_index(drop=True, inplace=True)
    assert blocked.equals(single)
    dropped = blocked[~blocked["is_kept"]]
    assert set(dropped["vec_id"]) == {500 + i for i in range(10)}
    assert list(dropped.sort_values("vec_id")["matched_id"]) == list(range(10))

    # per-task cap: no (list_id, bi, bj) group exceeds 2*block_target
    # (+ slack for crc32 imbalance at this n)
    assigned = emb.withColumn("list_id", (F.col("vec_id") % 2).cast("long"))
    rep = _block_pair_replicate(assigned, "vec_id", "embedding", 64)
    sizes = rep.groupBy("list_id", "bi", "bj").count().toPandas()["count"]
    assert sizes.max() <= int(2.5 * 64)
    # exact pair coverage: every unordered within-cluster pair in
    # exactly one group
    import pandas as pd

    pdf = rep.toPandas()
    seen: dict[tuple, int] = {}
    for (_, _, _), grp in pdf.groupby(["list_id", "bi", "bj"]):
        bi = grp["bi"].iloc[0]
        bj = grp["bj"].iloc[0]
        left = grp[grp["_blk"] == bi]["vec_id"]
        right = grp[grp["_blk"] == bj]["vec_id"]
        if bi == bj:
            ids = sorted(left)
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    seen[(ids[x], ids[y])] = seen.get((ids[x], ids[y]), 0) + 1
        else:
            for a in left:
                for b in right:
                    p = (min(a, b), max(a, b))
                    seen[p] = seen.get(p, 0) + 1
    clusters = pd.Series(
        {i: i % 2 for i in range(n)}
    )
    expect = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if clusters[a] == clusters[b]
    }
    assert set(seen) == expect
    assert all(v == 1 for v in seen.values())


def test_semantic_dedup_matches_exact_within_cluster_semantics(spark):
    """Every dropped row must have cosine >= threshold to some lower-id
    row in its own cluster (the reported match), every kept row must
    have none, and exactly one representative per near-dup group
    survives. Verified against a brute-force recomputation per cluster."""
    import numpy as np

    from dimagi_data_platform_spark.operators.similarity import (
        _fold_cosine,
        _fold_norms,
        _matrix,
        semantic_dedup,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    out = semantic_dedup(emb, threshold=0.35).toPandas()
    assert len(out) == emb.count()
    assert out["is_kept"].any() and (~out["is_kept"]).any()
    src = emb.toPandas().set_index("vec_id")
    import pandas as pd

    for _, grp in out.groupby("list_id"):
        grp = grp.sort_values("vec_id").reset_index(drop=True)
        X = _matrix(pd.Series([src.loc[i, "embedding"] for i in grp["vec_id"]]))
        cos = _fold_cosine(X, X, _fold_norms(X))
        ids = grp["vec_id"].to_numpy()
        dup = (cos >= 0.35) & (ids[:, None] > ids[None, :])
        np.testing.assert_array_equal(~grp["is_kept"].to_numpy(), dup.any(axis=1))
        for i in np.nonzero(dup.any(axis=1))[0]:
            j = np.where(dup[i], cos[i], -np.inf).argmax()
            assert grp.loc[i, "matched_id"] == ids[j]
            assert grp.loc[i, "cos_sim"] == cos[i, j]


def test_simhash_identical_docs_distance_zero(spark):
    docs = _near_dup_corpus(spark)
    fps = {r.doc_id: (r.fp1, r.fp2) for r in simhash_fingerprints(docs).collect()}
    assert fps[1] == fps[3]
    # 128-bit hamming thresholds double vs the old 64-bit layout: a
    # one-token change lands around 2x the bit flips (13 here)
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             simhash_near_dup_pairs(docs, max_hamming=20, n_chunks=21).collect()}
    assert pairs[(1, 3)] == 0
    assert (1, 2) in pairs  # near-dup within hamming 20


def test_simhash_pigeonhole_exact_recall_vs_bruteforce(spark):
    """The chunk-blocked pair set must EQUAL the brute-force 128-bit
    hamming-threshold pair set (pigeonhole exactness, d+1 chunks), and
    chunks that straddle the fp1/fp2 long boundary must not lose
    candidates."""
    rows = [
        (i, f"shared base tokens alpha beta gamma delta epsilon zeta "
            f"eta theta iota kappa variant{i % 4} extra{i % 3}")
        for i in range(24)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    fps = {r.doc_id: (r.fp1, r.fp2)
           for r in simhash_fingerprints(docs).collect()}

    def ham(a, b):
        m = (1 << 64) - 1
        return (bin((a[0] ^ b[0]) & m).count("1")
                + bin((a[1] ^ b[1]) & m).count("1"))

    for d in (6, 20):
        want = {
            (a, b): ham(fps[a], fps[b])
            for a in fps for b in fps
            if a < b and ham(fps[a], fps[b]) <= d
        }
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_near_dup_pairs(
                docs, max_hamming=d, n_chunks=d + 1
            ).collect()
        }
        assert got == want


def test_knn_lsh_subset_of_bruteforce_scores(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    bf = knn_bruteforce(emb, q, k=5).collect()
    ls = knn_lsh(emb, q, k=5).collect()
    bf_best = {}
    for r in bf:
        bf_best.setdefault(r.q_id, max(bf_best.get(r.q_id, -2), r.cos_sim))
    # LSH scores can never exceed the exact top score
    for r in ls:
        assert r.cos_sim <= bf_best[r.q_id] + 1e-12
    # every query with a non-empty bucket returns ranked results 1..k
    by_q = {}
    for r in ls:
        by_q.setdefault(r.q_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_lsh_duplicate_class_banding_is_distinct_sig(spark):
    """A duplicate class (many docs, one signature) must band as ONE
    representative — bucket-group probe work scales with distinct
    signatures — while the emitted pair set still covers every
    same-class pair at est exactly 1.0."""
    from dimagi_data_platform_spark.operators.minhash import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    n_dup = 40
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(n_dup)]
    rows += [
        (1000 + i, f"unique text number {i} foo bar baz qux quux corge")
        for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs)
    n_distinct = sigs.select("sig").distinct().count()
    assert n_distinct == 6  # 1 dup-class sig + 5 unique
    got = {
        (r.id_a, r.id_b): r.est_jaccard for r in lsh_candidate_pairs(sigs).collect()
    }
    for a in range(n_dup):
        for b in range(a + 1, n_dup):
            assert got[(a, b)] == 1.0
    # no candidate may pair a doc with itself or invert order
    assert all(a < b for a, b in got)


def test_lsh_recall_on_planted_near_duplicates(spark):
    # plant a near-identical copy of each query vector; LSH must find it
    emb = load_table(spark, SF_SMALL, "embeddings").limit(50)
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.000001)).alias("embedding"),
        F.col("label"),
    )
    corpus = emb.unionByName(planted)
    q = corpus.filter(F.col("vec_id") < 5)
    out = knn_lsh(corpus, q, k=1)
    top1 = {r.q_id: r.neighbor_id for r in out.collect()}
    for qid, nid in top1.items():
        assert nid == qid + 10000  # scaled copy has cosine 1 and same bucket


def test_knn_sq_rerank_recall_and_exact_scores(spark):
    """SQ8 + rerank must (a) reach high recall vs brute force and
    (b) report EXACT scores for every returned pair — the rerank uses
    the same codegen fold chain, so any returned (q, n) pair's cos_sim
    must equal brute force's bitwise."""
    from dimagi_data_platform_spark.operators.similarity import (
        knn_bruteforce,
        knn_sq_rerank,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    bf = {(r.q_id, r.neighbor_id): r.cos_sim for r in knn_bruteforce(emb, q, k=5).collect()}
    sq = {(r.q_id, r.neighbor_id): r.cos_sim for r in knn_sq_rerank(emb, q, k=5).collect()}
    recall = len(set(bf) & set(sq)) / len(bf)
    assert recall >= 0.8, f"SQ rerank recall too low: {recall}"
    # exact full-corpus scores for every pair both agree on
    full = {
        (r.q_id, r.neighbor_id): r.cos_sim
        for r in knn_bruteforce(emb, q, k=50).collect()
    }
    for pair, sim in sq.items():
        if pair in full:
            assert sim == full[pair], f"rerank score not exact for {pair}"


def test_sq_codes_roundtrip(spark, tmp_path):
    """Persisted SQ codes serve identical results to the inline path
    (same sample -> same scales -> same candidates -> same exact
    rerank)."""
    from dimagi_data_platform_spark.operators.similarity import (
        build_sq_codes,
        knn_sq_from_codes,
        knn_sq_rerank,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "sq_codes")
    build_sq_codes(emb, path)
    inline = sorted(map(tuple, knn_sq_rerank(emb, q, k=5).collect()))
    served = sorted(map(tuple, knn_sq_from_codes(spark, path, q, k=5).collect()))
    assert served == inline and served


def test_knn_ivf_recall_vs_bruteforce(spark):
    from dimagi_data_platform_spark.operators.similarity import knn_ivf

    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    bf = knn_bruteforce(emb, q, k=5).collect()
    iv = knn_ivf(emb, q, k=5, nlist=8, nprobe=4).collect()
    bf_set = {(r.q_id, r.neighbor_id) for r in bf}
    iv_set = {(r.q_id, r.neighbor_id) for r in iv}
    # probing half the lists must recover a solid majority of the
    # exact top-5 sets (deterministic seed -> stable assertion)
    recall = len(bf_set & iv_set) / len(bf_set)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    # scores are exact cosines, so they can never beat brute force
    bf_best = {}
    for r in bf:
        bf_best.setdefault(r.q_id, max(bf_best.get(r.q_id, -2), r.cos_sim))
    for r in iv:
        assert r.cos_sim <= bf_best[r.q_id] + 1e-12


def test_stratified_sample_fraction_bounds(spark):
    from dimagi_data_platform_spark.operators.corpus import stratified_sample

    docs = load_table(spark, SF_SMALL, "documents")
    frac = {"en": 0.5, "es": 1.0, "de": 0.0}
    out = stratified_sample(docs, "lang", frac)
    tot = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get("de", 0) == 0                      # fraction 0 -> empty
    assert got.get("es", 0) == tot.get("es", 0)       # fraction 1 -> all
    if "en" in tot and tot["en"] >= 20:
        assert 0.2 * tot["en"] <= got.get("en", 0) <= 0.8 * tot["en"]
    # determinism: same seed, same rows
    again = stratified_sample(docs, "lang", frac)
    assert sorted(r.doc_id for r in out.collect()) == sorted(r.doc_id for r in again.collect())


def test_embedding_near_dup_lsh_contained_in_exact(spark):
    from dimagi_data_platform_spark.operators.similarity import (
        embedding_near_dup_lsh,
        embedding_near_dup_pairs,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    exact = {(r.id_a, r.id_b): r.cos_sim for r in embedding_near_dup_pairs(emb, 0.3).collect()}
    approx = {(r.id_a, r.id_b): r.cos_sim for r in embedding_near_dup_lsh(emb, 0.3).collect()}
    # every LSH pair must be a true near-dup with the EXACT same score
    # (blocking only prunes candidates; the re-rank is the exact kernel)
    for k, v in approx.items():
        assert k in exact and exact[k] == v

    # recall guarantee is for HIGH-similarity pairs (actual near-dups):
    # plant scaled copies (cosine exactly 1) — they share every bucket
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.000001)).alias("embedding"),
        F.col("label"),
    )
    corpus = emb.unionByName(planted)
    got = {(r.id_a, r.id_b) for r in embedding_near_dup_lsh(corpus, 0.99).collect()}
    for qid in range(5):
        assert (qid, qid + 10000) in got


def test_embedding_near_dup_capped_pairs_and_honest_mass(spark):
    """The bounded default: every emitted pair is a true near-dup with
    the exact cosine, candidate volume is LINEAR (<= n*W*tables), the
    mass columns are exact (compared + dropped == choose(n, 2)), and
    planted cosine-1 twins are recovered (sort adjacency)."""
    from dimagi_data_platform_spark.operators.similarity import (
        embedding_near_dup_capped,
        embedding_near_dup_pairs,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    exact = {(r.id_a, r.id_b): r.cos_sim
             for r in embedding_near_dup_pairs(emb, 0.3).collect()}
    rows = embedding_near_dup_capped(emb, 0.3).collect()
    capped = {(r.id_a, r.id_b): r.cos_sim for r in rows}
    for k, v in capped.items():
        assert k in exact and exact[k] == v  # exact kernel, true pairs
    masses = {(r.compared_pairs, r.dropped_pairs) for r in rows}
    assert len(masses) == 1  # one scalar mass broadcast to every row
    compared, dropped = masses.pop()
    assert compared + dropped == n * (n - 1) // 2
    # linear candidate bound: n*W*(coarse tables + fine-bucket probe
    # tables) — window-join capped per pass, skew-immune
    assert compared <= n * 16 * (8 + 8)
    assert compared >= len(capped)  # kernel verified all candidates
    assert dropped > 0  # the cap actually pruned at this corpus

    # recall property: an identical-direction twin has the same bucket
    # bits and projection value on every pass, so it sorts IMMEDIATELY
    # adjacent and must be recovered
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.000001)).alias(
            "embedding"
        ),
        F.col("label"),
    )
    corpus = emb.unionByName(planted)
    got = {(r.id_a, r.id_b)
           for r in embedding_near_dup_capped(corpus, 0.99).collect()}
    for qid in range(5):
        assert (qid, qid + 10000) in got


def test_ivf_index_roundtrip(spark, tmp_path):
    """Persisted IVF index serves the same results as the inline path,
    and the probe filter lands on the partition column (pruned scan)."""
    from dimagi_data_platform_spark.operators.similarity import (
        build_ivf_index,
        knn_ivf,
        knn_ivf_from_index,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "ivf_index")
    build_ivf_index(emb, path, nlist=16)

    inline = knn_ivf(emb, queries, k=5, nlist=16, nprobe=4).collect()
    served = knn_ivf_from_index(spark, path, queries, k=5, nprobe=4)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "list_id" in plan and "PartitionFilters" in plan
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, inline))


def test_ngram_shingle_df_cap_bounds_group_size(spark):
    """A stopword-shingle shared by every doc must not generate O(n²)
    pairs: docs whose only overlap is a hot (df > MAX_SHINGLE_DF)
    shingle don't pair at all."""
    from dimagi_data_platform_spark.plans.queries import MAX_SHINGLE_DF

    hot = "the common header line"  # 4 tokens -> 2 shared 3-gram shingles
    n = MAX_SHINGLE_DF + 25
    rows = [(i, f"{hot} unique tail {i} alpha beta gamma delta") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        from dimagi_data_platform_spark.plans.queries import ngram_jaccard_pairs

        assert ngram_jaccard_pairs(spark, d).count() == 0


# ---------------------------------------------------------------- wordpiece
def test_wordpiece_encode_word_pure():
    from dimagi_data_platform_spark.functions.tokenizer import UNK, encode_word

    vocab = frozenset(
        ["un", "##aff", "##able", "aff", "##ord", "hug", "##s", "b", "##ug"]
    )
    assert encode_word("unaffable", vocab) == ["un", "##aff", "##able"]
    assert encode_word("hugs", vocab) == ["hug", "##s"]
    assert encode_word("bug", vocab) == ["b", "##ug"]
    # greedy longest-match: "hug" wins over any shorter prefix
    assert encode_word("hug", vocab) == ["hug"]
    assert encode_word("xyz", vocab) == [UNK]   # unmatchable start
    assert encode_word("hugx", vocab) == [UNK]  # unmatchable tail
    assert encode_word("", vocab) == []
    assert encode_word("a" * 200, vocab) == [UNK]  # max_word_len guard


def test_wordpiece_encode_dataframe(spark):
    from dimagi_data_platform_spark.functions.tokenizer import wordpiece_encode

    vocab = {"un", "##aff", "##able", "hug", "##s"}
    df = spark.createDataFrame(
        [(1, "Unaffable HUGS"), (2, "zzz"), (3, None), (4, "")],
        "id long, text string",
    )
    out = {
        r.id: r.pieces
        for r in wordpiece_encode(df, "text", vocab).collect()
    }
    assert out[1] == ["un", "##aff", "##able", "hug", "##s"]  # lower-cased
    assert out[2] == ["[UNK]"]
    assert out[3] == [] and out[4] == []
    schema = dict(wordpiece_encode(df, "text", vocab).dtypes)
    assert schema["pieces"] == "array<string>"


# ---------------------------------------------------------------- pca
def test_pca_components_match_numpy_reference(spark):
    import numpy as np

    from dimagi_data_platform_spark.operators.pca import pca_components

    rng = np.random.RandomState(4)
    # anisotropic cloud: variance concentrated on two known axes
    base = rng.randn(400, 64) * 0.05
    base[:, 3] += rng.randn(400) * 2.0
    base[:, 17] += rng.randn(400) * 1.0
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(base)],
        "vec_id long, embedding array<double>",
    )
    mean, comps, ev = pca_components(df, k=2, dim=64)
    assert ev[0] > ev[1] > 0
    # top axes recover the planted directions
    assert abs(comps[0][3]) > 0.95 and abs(comps[1][17]) > 0.9
    # orthonormal
    G = comps @ comps.T
    assert np.allclose(G, np.eye(2), atol=1e-9)
    # quantized-integer scatter ⇒ identical across repartitionings
    _, comps2, ev2 = pca_components(df.repartition(13), k=2, dim=64)
    assert np.array_equal(comps, comps2) and np.array_equal(ev, ev2)


def test_pca_project_reduces_reconstruction_error(spark):
    import numpy as np

    from dimagi_data_platform_spark.operators.pca import (
        pca_components,
        pca_project,
    )

    rng = np.random.RandomState(9)
    X = rng.randn(300, 64) * (2.0 * 0.7 ** np.arange(64))
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    out = pca_project(df, k=8, dim=64)
    got = {r.vec_id: np.array(r.pca_vec) for r in out.collect()}
    assert len(got) == 300 and got[0].shape == (8,)
    mean, comps, _ = pca_components(df, k=8, dim=64)
    # projecting captures most variance: reconstruction beats mean-only
    recon = np.stack([got[i] @ comps + mean for i in range(300)])
    err_pca = float(((X - recon) ** 2).sum())
    err_mean = float(((X - X.mean(0)) ** 2).sum())
    assert err_pca < 0.2 * err_mean


def test_knn_ivfpq_recall_and_exact_scores(spark):
    """IVF-PQ must (a) reach solid recall vs brute force with nprobe
    covering part of the lists and (b) report EXACT scores for every
    returned pair (the rerank reuses the codegen fold chain), and
    (c) be deterministic across runs (fixed seeds + deterministic
    training sample)."""
    from dimagi_data_platform_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivfpq,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    bf = {(r.q_id, r.neighbor_id): r.cos_sim for r in knn_bruteforce(emb, q, k=5).collect()}
    pq_rows = knn_ivfpq(emb, q, k=5, nlist=8, nprobe=4).collect()
    pq = {(r.q_id, r.neighbor_id): r.cos_sim for r in pq_rows}
    recall = len(set(bf) & set(pq)) / len(bf)
    assert recall >= 0.6, f"IVF-PQ recall too low: {recall}"
    full = {
        (r.q_id, r.neighbor_id): r.cos_sim
        for r in knn_bruteforce(emb, q, k=50).collect()
    }
    for pair, sim in pq.items():
        if pair in full:
            assert sim == full[pair], f"rerank score not exact for {pair}"
    again = sorted(map(tuple, knn_ivfpq(emb, q, k=5, nlist=8, nprobe=4).collect()))
    assert again == sorted(map(tuple, pq_rows))


def test_prefix_join_lossless_vs_full_shingle_join(spark):
    """Prefix filtering must be pure pruning: the t=0.5 prefix join's
    output equals the full all-bucket shingle join thresholded at the
    same t — pair for pair, intersection count for intersection count."""
    from dimagi_data_platform_spark.plans.queries import QUERIES

    full = {
        (r.doc_a, r.doc_b): r.n_common
        for r in QUERIES["ngram_jaccard_pairs"](spark, SF_SMALL).collect()
        if r.jaccard >= 0.5
    }
    pref = {
        (r.doc_a, r.doc_b): r.n_common
        for r in QUERIES["jaccard_prefix_join"](spark, SF_SMALL).collect()
    }
    assert pref == full and pref


# ---- exact substring dedup (Lee et al. 2022 shape) ----


def _substr_dedup(spark, rows):
    """Run the substring_dedup_clean pipeline on an in-memory corpus by
    monkey-free reuse: write to a temp dir shaped like a sf_dir."""
    import os
    import tempfile

    from dimagi_data_platform_spark.plans.queries import QUERIES

    d = tempfile.mkdtemp(prefix="substrdedup")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return {
        r.doc_id: r.asDict()
        for r in QUERIES["substring_dedup_clean"](spark, d).collect()
    }


def test_substring_dedup_removes_later_copy_only(spark):
    first = "a b c d e f g h"                     # 8 tokens = one gram
    rows = [
        (1, first + " x y z"),
        (2, "p q r " + first + " s t"),            # contains the copy
        (3, "entirely unrelated tokens here nothing shared at all"),
    ]
    got = _substr_dedup(spark, rows)
    assert got[1]["n_removed"] == 0                # first occurrence survives
    assert got[2]["n_removed"] == 8                # exactly the copied gram
    assert got[3]["n_removed"] == 0


def test_substring_dedup_overlapping_repeat_within_doc(spark):
    # a 9-token repeat = two overlapping 8-grams; the SECOND occurrence
    # (later position, same doc) loses all 9 covered positions
    run = "a b c d e f g h i"
    rows = [(1, run + " zz " + run)]
    got = _substr_dedup(spark, rows)
    assert got[1]["n_removed"] == 9


def test_substring_dedup_short_docs_untouched(spark):
    rows = [(1, "only seven tokens in this tiny doc"),
            (2, "only seven tokens in this tiny doc")]
    got = _substr_dedup(spark, rows)
    # 7 tokens < k=8: no grams, nothing removable even for exact dups
    assert got[1]["n_removed"] == 0 and got[2]["n_removed"] == 0


def test_ivf_index_append_equals_full_rebuild(spark, tmp_path):
    """Incremental IVF maintenance (VERDICT r7 item 3): build on the
    base corpus, append a new batch against the STORED centroids —
    the served results must be IDENTICAL to a full rebuild on the
    union, because the rebuild trains on the same deterministic
    sample (lowest sample_rows ids, all inside the base) and the
    appended vectors land in the lists that quantizer assigns."""
    from dimagi_data_platform_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        knn_ivf_from_index,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    queries = emb.filter(F.col("vec_id") < 10)

    inc = str(tmp_path / "ivf_inc")
    build_ivf_index(base, inc, nlist=16, sample_rows=256)
    n = append_to_ivf_index(batch, inc)
    assert n == batch.count() and n > 0

    full = str(tmp_path / "ivf_full")
    build_ivf_index(emb, full, nlist=16, sample_rows=256)

    got = sorted(map(tuple, knn_ivf_from_index(spark, inc, queries, k=5, nprobe=4).collect()))
    want = sorted(map(tuple, knn_ivf_from_index(spark, full, queries, k=5, nprobe=4).collect()))
    assert got == want and got
    # appended rows are actually reachable: a query FROM the appended
    # batch finds appended-batch neighbors
    q2 = emb.filter(F.col("vec_id") >= 490)
    res = knn_ivf_from_index(spark, inc, q2, k=5, nprobe=16).collect()
    assert {r.q_id for r in res} == set(range(490, 500))
    # and the partitioned layout grew in place (per-list append files),
    # still served with partition pruning
    plan = (
        knn_ivf_from_index(spark, inc, queries, k=5, nprobe=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_sq_codes_append_equals_full_rebuild(spark, tmp_path):
    """Incremental SQ-code maintenance: append quantizes with the
    STORED scales, so append ≡ rebuild-with-same-sample bitwise."""
    from dimagi_data_platform_spark.operators.similarity import (
        append_to_sq_codes,
        build_sq_codes,
        knn_sq_from_codes,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    queries = emb.filter(F.col("vec_id") < 10)

    inc = str(tmp_path / "sq_inc")
    build_sq_codes(base, inc, sample_rows=256)
    n = append_to_sq_codes(batch, inc)
    assert n == batch.count() and n > 0

    full = str(tmp_path / "sq_full")
    build_sq_codes(emb, full, sample_rows=256)

    got = sorted(map(tuple, knn_sq_from_codes(spark, inc, queries, k=5).collect()))
    want = sorted(map(tuple, knn_sq_from_codes(spark, full, queries, k=5).collect()))
    assert got == want and got


def test_ivfpq_index_roundtrip_and_append(spark, tmp_path):
    """Persisted IVF-PQ index (the third member of the build/serve/
    append trio): serving from the index matches the inline knn_ivfpq
    with the same parameters, append+serve ≡ full rebuild on the union
    (training sample inside the base), appended vectors reachable, and
    probed-list pruning survives the persisted layout."""
    from dimagi_data_platform_spark.operators.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        knn_ivfpq,
        knn_ivfpq_from_index,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    queries = emb.filter(F.col("vec_id") < 10)
    kw = dict(nlist=8, m_sub=8, ksub=16, sample_rows=256)

    inc = str(tmp_path / "pq_inc")
    build_ivfpq_index(base, inc, **kw)
    n = append_to_ivfpq_index(batch, inc)
    assert n == batch.count() and n > 0

    full = str(tmp_path / "pq_full")
    build_ivfpq_index(emb, full, **kw)

    got = sorted(
        map(tuple, knn_ivfpq_from_index(spark, inc, queries, k=5, nprobe=4).collect())
    )
    want = sorted(
        map(tuple, knn_ivfpq_from_index(spark, full, queries, k=5, nprobe=4).collect())
    )
    assert got == want and got

    # persisted serve == inline operator with identical params
    inline = sorted(
        map(
            tuple,
            knn_ivfpq(
                emb, queries, k=5, nprobe=4, nlist=8, m_sub=8, ksub=16,
                sample_rows=256, seed=7,
            ).collect(),
        )
    )
    assert got == inline

    # appended rows reachable from appended-batch queries
    q2 = emb.filter(F.col("vec_id") >= 490)
    res = knn_ivfpq_from_index(spark, inc, q2, k=5, nprobe=8).collect()
    assert {r.q_id for r in res} == set(range(490, 500))

    # partition pruning on the persisted code layout
    plan = (
        knn_ivfpq_from_index(spark, inc, queries, k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_gather_kernel_bitwise_equals_join_kernel(spark):
    """The broadcast-matrix gather kernel must produce BITWISE the
    same cos_sim as the join kernel (same float32→float64 casts, same
    in-order fold) — a last-ulp divergence would hash-break the
    capped oracle at exactly the corpus sizes the driver never gates."""
    import numpy as np
    from pyspark.sql import functions as F

    from dimagi_data_platform_spark.operators.similarity import (
        _score_pairs_exact,
        _score_pairs_exact_gather,
        project_features,
    )

    rng = np.random.RandomState(17)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.rand(64)]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    feats = project_features(emb).localCheckpoint()
    ids = [r.id for r in feats.select("id").collect()]
    cand = spark.createDataFrame(
        [(a, b) for a in ids[:20] for b in ids[20:40]],
        "id_a long, id_b long",
    )
    a = feats.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    b = feats.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    joined = {
        (r.id_a, r.id_b): r.cos_sim
        for r in _score_pairs_exact(
            cand.join(a, "id_a").join(b, "id_b"), -1.0
        ).collect()
    }
    gathered = {
        (r.id_a, r.id_b): r.cos_sim
        for r in _score_pairs_exact_gather(cand, feats, -1.0).collect()
    }
    assert set(joined) == set(gathered) and len(joined) == 400
    for k in joined:
        assert joined[k] == gathered[k], (k, joined[k].hex(), gathered[k].hex())

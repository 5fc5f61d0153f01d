"""MinHash + LSH near-duplicate candidate generation.

Pipeline (all DataFrame ops, one pass over shingles):
  shingle → md5-derived 60-bit base hash → k universal hashes
  ((a*h+b) mod p, fixed seeds) → per-doc min per hash (the MinHash
  signature) → band the signature (b bands × r rows), hash each band
  → self-join on (band, band_hash) = candidate pairs
  → estimated similarity = fraction of equal signature components.

The base hash is md5 (identical in every engine) rather than
xxhash64, so signatures — and therefore pairs and est_jaccard — are
engine-reproducible and the whole operator sits behind the SQL-oracle
hash gate. Band bucket ids stay xxhash64: they are internal grouping
keys that never surface, so only the grouping (not the id value) must
agree.

Scale: the only shuffles are the per-doc signature aggregation and the
band-bucket join — never an O(n²) cross join. Band count/size trade
recall vs candidate volume exactly as in the MMDS formulation
(threshold ≈ (1/b)^(1/r)).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dimagi_data_platform_spark.functions.text import shingles_from_tokens, tokens

# Mersenne prime 2^31-1: xxhash64 folded below 2^31 keeps a*h+b < 2^62,
# so the universal-hash arithmetic never overflows a long.
MINHASH_P = 2_147_483_647


def _hash_params(k: int, seed: int) -> list[tuple[int, int]]:
    rnd = random.Random(seed)
    return [(rnd.randrange(1, MINHASH_P), rnd.randrange(0, MINHASH_P)) for _ in range(k)]


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Return (id, sig: array<long>[num_hashes])."""
    # repartition first: small corpora arrive as one parquet split and
    # the shingle/hash map-side work would otherwise run in ONE task
    # (8x measured at sf0.1); at real scale the scan is already split
    # and this round-robin shuffle of raw text is noise vs the explode
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = (
        docs.repartition(par)
        .withColumn("_toks", tokens(text_col))
        .select(
            F.col(id_col),
            F.explode(shingles_from_tokens("_toks", shingle_n)).alias("shingle"),
        )
    )
    return signatures_from_shingles(sh, id_col=id_col, num_hashes=num_hashes, seed=seed)


def signatures_from_shingles(
    sh: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingle",
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Signature chain over an EXISTING (id, shingle) stream — lets a
    caller that already exploded shingles for another consumer (e.g.
    the exact-Jaccard machinery in the L55 band-tuning eval) share one
    tokenize/explode pass instead of re-scanning the corpus.  Identical
    output to :func:`minhash_signatures` by construction (that function
    now delegates here)."""
    # 15 hex chars = 60 bits → fits signed 64 exactly; pmod folds below
    # P so a*h+b stays under 2^62 (no ANSI overflow)
    h = F.pmod(
        F.conv(F.substring(F.md5(shingle_col), 1, 15), 16, 10).cast("long"),
        F.lit(MINHASH_P),
    )
    sh = sh.withColumn("h", h)
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MINHASH_P))).alias(f"s{i}")
        for i, (a, b) in enumerate(_hash_params(num_hashes, seed))
    ]
    sigs = sh.groupBy(id_col).agg(*aggs)
    return sigs.select(
        id_col, F.array(*[f"s{i}" for i in range(num_hashes)]).alias("sig")
    )


def _band_entries(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """(id, band, bucket) triples: one row per signature band, bucket =
    xxhash64 of the band's signature slice (internal grouping key)."""
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.col("sig")[i * rows_per_band + j] for j in range(rows_per_band)]
                            )
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def _est_jaccard(sig_a, sig_b):
    eq = F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int"))
    return F.aggregate(eq, F.lit(0), lambda acc, x: acc + x).cast("double") / F.size(
        sig_a
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing at least one band bucket,
    with ``est_jaccard`` = fraction of equal signature components.

    Self-similar corpora collapse many docs onto ONE signature; those
    docs share every band bucket, so banding raw ids would put whole
    duplicate classes into each bucket group and the in-group pair
    expand would be O(class²) probe work in one task. Banding therefore
    runs over DISTINCT signatures only (the same trick as simhash's
    distinct-fingerprint chunk join): same-signature doc pairs emit
    directly with est = 1.0, and qualifying representative pairs fan
    back out to doc pairs through two membership joins — that fan-out
    is output, not probe work.

    Shuffle discipline: only (rep, band, bucket) triples — 24 bytes/row
    — travel through the candidate-generation shuffle; the signature
    arrays (64 longs) are joined back onto the (much smaller) distinct
    representative-pair set afterwards, as plain shuffle joins (the
    signature table is O(corpus) and must never be broadcast; AQE may
    broadcast the PAIR side if it is tiny).
    """
    grouped = (
        sigs.groupBy("sig")
        .agg(
            F.min(id_col).alias("rep"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
        .localCheckpoint()  # three consumers: reps, same-sig, membership
    )

    # 1) same-signature pairs: every component equal -> est exactly 1.0
    same_structs = F.flatten(
        F.transform(
            "members",
            lambda x, i: F.transform(
                F.slice(F.col("members"), (i + 2).cast("int"), F.size("members")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    same = (
        grouped.filter(F.size("members") > 1)
        .select(F.explode(same_structs).alias("p"))
        .select("p.id_a", "p.id_b", F.lit(1.0).alias("est_jaccard"))
    )

    # 2) banding over one representative per distinct signature
    rep_sigs = grouped.select(F.col("rep").alias(id_col), "sig")
    band_entries = _band_entries(rep_sigs, id_col, bands, rows_per_band)
    bucket_groups = (
        band_entries.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("docs"))
        .filter(F.size("docs") > 1)
    )
    pair_structs = F.flatten(
        F.transform(
            "docs",
            lambda x, i: F.transform(
                F.slice(F.col("docs"), (i + 2).cast("int"), F.size("docs")),
                lambda y: F.struct(x.alias("rep_a"), y.alias("rep_b")),
            ),
        )
    )
    rep_pairs = (
        bucket_groups.select(F.explode(pair_structs).alias("p"))
        .select("p.rep_a", "p.rep_b")
        .distinct()
    )
    sig_a = rep_sigs.select(F.col(id_col).alias("rep_a"), F.col("sig").alias("sig_a"))
    sig_b = rep_sigs.select(F.col(id_col).alias("rep_b"), F.col("sig").alias("sig_b"))
    joined = rep_pairs.join(sig_a, "rep_a").join(sig_b, "rep_b")
    est = _est_jaccard(F.col("sig_a"), F.col("sig_b"))
    scored_reps = joined.select("rep_a", "rep_b", est.alias("est_jaccard"))

    # 3) fan representative pairs out to member pairs (classes are
    # disjoint, so no duplicates; order normalized with least/greatest)
    mem = grouped.select("rep", F.explode("members").alias("m"))
    ma = mem.select(F.col("rep").alias("rep_a"), F.col("m").alias("m_a"))
    mb = mem.select(F.col("rep").alias("rep_b"), F.col("m").alias("m_b"))
    cross = (
        scored_reps.join(ma, "rep_a")
        .join(mb, "rep_b")
        .select(
            F.least("m_a", "m_b").alias("id_a"),
            F.greatest("m_a", "m_b").alias("id_b"),
            "est_jaccard",
        )
    )
    return same.unionByName(cross)


def incremental_lsh_matches(
    corpus_sigs: DataFrame,
    batch_sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    min_est_jaccard: float = 0.5,
    corpus_members: DataFrame | None = None,
) -> DataFrame:
    """Near-dup matches of an INCOMING batch against the EXISTING
    corpus — the ingest-time dedup shape for a growing corpus: nothing
    intra-batch or intra-corpus is compared, so probe work scales with
    the batch's band entries, never O(corpus²). ``corpus_sigs`` is the
    signature table production persists at ingest (num_hashes longs per
    doc); each new batch signs itself and probes the corpus buckets.

    Returns (batch_id, corpus_id, est_jaccard) for every candidate pair
    sharing >= 1 band bucket with est_jaccard >= the threshold.

    Hot-bucket discipline: a corpus with huge EXACT-duplicate classes
    would concentrate those classes in every bucket they touch if band
    entries were per raw doc. Pass a ``corpus_sigs`` table already
    collapsed to one representative per DISTINCT signature (what
    `build_signature_table` persists) plus its ``corpus_members``
    (rep → member) table: the probe then does per-distinct-signature
    work, and matches fan back out to member ids AFTER the threshold
    filter — output fan-out, not probe fan-out. Equal signatures share
    every band bucket and score identically, so the fanned-out result
    is row-identical to probing raw per-doc signatures. With
    ``corpus_members=None`` the corpus is probed as-is.
    """
    be_c = _band_entries(corpus_sigs, id_col, bands, rows_per_band).select(
        F.col(id_col).alias("corpus_id"), "band", "bucket"
    )
    be_b = _band_entries(batch_sigs, id_col, bands, rows_per_band).select(
        F.col(id_col).alias("batch_id"), "band", "bucket"
    )
    cand = be_b.join(be_c, ["band", "bucket"]).select("batch_id", "corpus_id").distinct()
    sig_b = batch_sigs.select(F.col(id_col).alias("batch_id"), F.col("sig").alias("sig_a"))
    sig_c = corpus_sigs.select(F.col(id_col).alias("corpus_id"), F.col("sig").alias("sig_b"))
    # Batch side: bounded (one ingest batch) → broadcast is safe and
    # keeps the candidate set in place. Corpus side: O(corpus) — the
    # exact ~5 TB artifact build_signature_table documents — so it is a
    # plain shuffle join on corpus_id; the candidate set (not the
    # corpus) is what moves.
    joined = cand.join(F.broadcast(sig_b), "batch_id").join(sig_c, "corpus_id")
    est = _est_jaccard(F.col("sig_a"), F.col("sig_b"))
    matches = joined.select("batch_id", "corpus_id", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= min_est_jaccard
    )
    if corpus_members is not None:
        # rep → member fan-out on the (small, post-threshold) match set;
        # the membership table is O(corpus) so this is a shuffle join on
        # rep — AQE may broadcast the match side.
        matches = (
            matches.withColumnRenamed("corpus_id", "rep")
            .join(corpus_members, "rep")
            .select("batch_id", F.col("member").alias("corpus_id"), "est_jaccard")
        )
    return matches


def collapse_signatures(
    sigs: DataFrame, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Collapse a per-doc signature table to one representative row per
    DISTINCT signature. Returns ``(reps, members)``: reps has
    (id_col = min member id, sig); members has (rep, member) for every
    raw doc.

    The group key is a 128-bit md5 of the rendered signature, not the
    64-long array itself, so the shuffle key is 32 bytes instead of
    ~512 and no per-group list is ever materialized — a 10^8-doc
    exact-dup class costs one counter in the partial agg, not an 800 MB
    collect_list row."""
    keyed = sigs.withColumn(
        "_sk", F.md5(F.concat_ws(",", F.col("sig").cast("array<string>")))
    )
    grouped = keyed.groupBy("_sk").agg(
        F.min(id_col).alias("rep"),
        F.first("sig").alias("sig"),  # all sigs in a _sk group are equal
    )
    reps = grouped.select(F.col("rep").alias(id_col), "sig")
    members = (
        keyed.select("_sk", F.col(id_col).alias("member"))
        .join(grouped.select("_sk", "rep"), "_sk")
        .select("rep", "member")
    )
    return reps, members


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    min_est_jaccard: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n, seed)
    # No materialization here (r14): since the distinct-signature
    # collapse, `sigs` has exactly ONE consumer — the groupBy(sig)
    # inside lsh_candidate_pairs, which localCheckpoints its own
    # result for the three downstream consumers. Checkpointing sigs
    # too only added a barrier and a block-manager copy of the
    # signature pass.
    rows_per_band = num_hashes // bands
    pairs = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    return pairs.filter(F.col("est_jaccard") >= min_est_jaccard)


def build_signature_table(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> None:
    """Persist the corpus MinHash signature table — the artifact
    ingest-time dedup probes (`incremental_lsh_matches`) so arriving
    batches never re-sign the corpus. num_hashes longs per doc: at
    10^10 docs x 64 hashes that is ~5 TB, scanned (not shuffled) once
    per ingest batch; the band explode happens batch-side and the join
    shuffles only (id, band, bucket) triples.

    Layout: ``{path}/sigs`` holds ONE row per distinct signature (rep
    id + sig) and ``{path}/members`` the (rep, member) fan-out. Exact-
    duplicate classes therefore collapse at build time: every later
    batch probe does per-distinct-signature bucket work no matter how
    duplicated the raw corpus is, and match fan-out to raw doc ids
    happens after the threshold filter."""
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n, seed)
    reps, members = collapse_signatures(sigs, id_col)
    reps.write.mode("overwrite").parquet(f"{path}/sigs")
    members.write.mode("overwrite").parquet(f"{path}/members")


def incremental_dedup_from_index(
    spark,
    index_path: str,
    batch_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    min_est_jaccard: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Sign an incoming batch and probe the persisted corpus signature
    table (distinct-signature reps + membership — the
    `build_signature_table` layout). Returns (batch_id, corpus_id,
    est_jaccard) for every RAW corpus doc, identical to probing per-doc
    signatures directly."""
    corpus_sigs = spark.read.parquet(f"{index_path}/sigs")
    corpus_members = spark.read.parquet(f"{index_path}/members")
    batch_sigs = minhash_signatures(
        batch_docs, id_col, text_col, num_hashes, shingle_n, seed
    )
    return incremental_lsh_matches(
        corpus_sigs,
        batch_sigs,
        id_col,
        bands,
        num_hashes // bands,
        min_est_jaccard,
        corpus_members=corpus_members,
    )

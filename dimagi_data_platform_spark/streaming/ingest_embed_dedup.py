"""Streaming ingest-time EMBEDDING near-dup dedup against a GROWING
corpus — the vector sibling of :mod:`streaming.ingest_dedup` (P27) and
the ingest companion of ``embedding_near_dup_capped`` (L5c).

Each micro-batch of incoming vectors is sign-bucket-featurized (the
shared ``project_features`` Arrow pass of operators/similarity.py,
run at ``bucket_bits`` planes per table — multi-table hyperplane LSH,
the same family as ``embedding_near_dup_lsh``), probed against the
persisted corpus feature index by an equi-join on (table, bucket),
and split: rows whose exact fold-ordered cosine against any matched
corpus row reaches the threshold are dropped, survivors append to the
corpus sink AND their features to the index, so later batches dedup
against everything accepted so far.

Why sign buckets and not a projection grid: the first design joined
on a quantized 1-D projection cell (±1 neighborhood). A fixed grid
has O(100) usable cells per pass, so cell occupancy — and therefore
per-batch candidate volume and exact-cosine work — grows LINEARLY
with the corpus; the three-decade ingest certification
(tools/ingest_scale_cert.py) measured 5x per-batch cost per corpus
decade. A ``bucket_bits``-plane sign bucket has 2^bits buckets per
table; occupancy is corpus/2^bits, so ``bucket_bits`` is the
log-corpus knob: 16 bits holds expected occupancy ~3 at 200k vectors,
and at a 100 TB corpus (~10^10 vectors) 32-34 bits keeps candidates
batch-proportional. Recall at threshold 0.99 (angle ~8.1 deg,
per-plane flip p = theta/pi ~ 0.045): per-table (1-p)^16 ~ 0.48,
across 8 tables 1-(1-0.48)^8 ~ 0.995; EXACT duplicates always agree
on every bucket. Drops stay exact either way — a row is only dropped
on a verified cosine >= threshold (the capped-family contract: recall
is approximate, drops are exact).

Idempotence: both sink and index writes go to overwrite-by-batch_id
subdirectories (same pattern as ingest_dedup / events_stream), so a
batch that retries after writing replaces its earlier partial output.

In-batch duplicates: survivors are also bucket-probed against each
other (keep the lowest id of each near-dup pair) — without this, two
copies arriving in ONE batch would both pass the corpus probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dimagi_data_platform_spark.operators.similarity import (
    _score_pairs_exact,
    project_features,
)

# planes per hyperplane table: 2^bits buckets/table. The log-corpus
# knob — see the module docstring for the occupancy/recall math.
# Buckets are int64 bit patterns (project_features validates
# bucket_bits <= 62), so the 32-34 bit recommendation for ~10^10
# vectors is representable without sign-bit overflow.
DEFAULT_BUCKET_BITS = 16
N_TABLES = 8

# above this many batch rows the probe's batch side stops being
# broadcast (rows x n_tables entries x full vectors can exceed the
# driver/executor broadcast limits under an availableNow backfill that
# arrives as one giant batch) and falls back to a shuffle join, which
# completes at any size.
BROADCAST_ROW_LIMIT = 100_000


def _bucket_entries(feats: DataFrame, n_tables: int = N_TABLES):
    """(id, vec, t, bucket) — one row per (row, table) with the
    sign-pattern bucket (the ``b{t}`` columns project_features already
    computes); the probe joins on (t, bucket) exactly, no
    neighborhood explode."""
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"), F.col(f"b{t}").cast("long").alias("bucket")
            )
            for t in range(n_tables)
        ]
    )
    return feats.select(
        "id", "vec", F.explode(entries).alias("e")
    ).select("id", "vec", F.col("e.t").alias("t"), F.col("e.bucket").alias("bucket"))


def _bucket_matches(
    index_feats: DataFrame,
    batch_feats: DataFrame,
    threshold: float,
    batch_rows: int | None = None,
) -> DataFrame:
    """(id_a=corpus/lower id, id_b=batch id, cos_sim) for every
    bucket-colliding cross pair whose EXACT cosine reaches threshold.
    The batch side is BROADCAST when small (the common ingest shape:
    one bounded micro-batch x n_tables), so the corpus index never
    shuffles — its band entries stream map-side through the join, the
    P27 incremental_lsh_matches discipline. Above
    ``BROADCAST_ROW_LIMIT`` batch rows (an availableNow backfill can
    deliver the whole source as ONE batch) the broadcast hint is
    dropped: a shuffle join completes where an over-limit broadcast
    (rows x n_tables entries including full float vectors) would fail
    the job."""
    b = _bucket_entries(batch_feats).select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "t", "bucket"
    )
    c = _bucket_entries(index_feats).select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "t", "bucket"
    )
    if batch_rows is None or batch_rows <= BROADCAST_ROW_LIMIT:
        b = F.broadcast(b)
    cand = (
        c.join(b, ["t", "bucket"])
        .select("id_a", "id_b", "vec_a", "vec_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return _score_pairs_exact(cand, threshold)


def _check_index_bits(index_path: str, bucket_bits: int) -> None:
    """An index and its probes MUST share ``bucket_bits`` — a mismatch
    does not error, it silently matches NOTHING (different plane
    counts produce disjoint bucket values), which would wave every
    duplicate through. A `_bits.json` sidecar written with the first
    batch makes the mismatch LOUD (the customer_entity_resolution
    fail-loudly discipline). Local-filesystem sidecar: the test/bench
    harness shape; object-store deployments would pin the same value
    in the table's metadata."""
    import json as _json
    import os as _os

    marker = _os.path.join(index_path, "_bits.json")
    if _os.path.exists(marker):
        with open(marker) as f:
            stored = _json.load(f)["bucket_bits"]
        if stored != bucket_bits:
            raise ValueError(
                f"ingest index at {index_path} was built with "
                f"bucket_bits={stored}; probing with {bucket_bits} "
                "would silently match nothing — rebuild the index or "
                "pass the index's bucket_bits"
            )
    else:
        _os.makedirs(index_path, exist_ok=True)
        with open(marker, "w") as f:
            _json.dump({"bucket_bits": bucket_bits}, f)


def seed_embed_dedup_index(
    corpus: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_bits: int = DEFAULT_BUCKET_BITS,
    batch_id: int = 0,
) -> None:
    """Pre-seed the ingest index from an existing corpus — the ONLY
    supported way to build an index outside the streaming path.
    Writes the features under ``batch_id=`` AND the ``_bits.json``
    sidecar, so a later probe at a different ``bucket_bits`` fails
    loudly instead of silently matching nothing (an externally-written
    parquet index has no sidecar, and the first probe would otherwise
    stamp its OWN parameter and accept the mismatch)."""
    _check_index_bits(index_path, bucket_bits)
    project_features(
        corpus, id_col, vec_col, bucket_bits=bucket_bits
    ).write.mode("overwrite").parquet(f"{index_path}/batch_id={batch_id}")


def ingest_batch_embed_dedup(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    out_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    bucket_bits: int = DEFAULT_BUCKET_BITS,
) -> None:
    """Process one micro-batch: drop exact-cosine near-dups of the
    current index (sign-bucket candidates, exact verify), drop
    intra-batch near-dups (lowest id survives), then append the
    survivors to ``out_path`` and their features to ``index_path``
    (both under overwrite-by-batch_id subdirs)."""
    from pyspark.errors import AnalysisException

    _check_index_bits(index_path, bucket_bits)
    feats = project_features(
        batch_df, id_col, vec_col, bucket_bits=bucket_bits
    ).localCheckpoint()
    n_batch = feats.count()  # cheap: checkpointed; sizes the broadcast
    try:
        index = spark.read.parquet(index_path)
        matches = _bucket_matches(index, feats, threshold, batch_rows=n_batch)
        dup_ids = matches.select(F.col("id_b").alias("id")).distinct()
    except AnalysisException:  # first batch: index doesn't exist yet
        dup_ids = None

    survivors = feats
    if dup_ids is not None:
        survivors = survivors.join(dup_ids, "id", "left_anti")
    intra = _bucket_matches(
        survivors, survivors, threshold, batch_rows=n_batch
    ).filter(F.col("id_a") != F.col("id_b"))
    # in-batch: a row is dropped iff it near-dups ANY lower id — the
    # min-representative rule of semantic_dedup / ingest_dedup
    losers = intra.select(
        F.greatest("id_a", "id_b").alias("id")
    ).distinct()
    survivors = survivors.join(losers, "id", "left_anti").localCheckpoint()

    kept = batch_df.join(
        survivors.select(F.col("id").alias(id_col)), id_col, "left_semi"
    )
    kept.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")
    survivors.write.mode("overwrite").parquet(
        f"{index_path}/batch_id={batch_id}"
    )


def run_ingest_embed_dedup(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    bucket_bits: int = DEFAULT_BUCKET_BITS,
) -> None:
    """Drain ``stream`` through the ingest dedup with availableNow
    (test/backfill trigger; drop the trigger for continuous runs)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch_embed_dedup(
            batch_df.sparkSession,
            batch_df,
            batch_id,
            index_path,
            out_path,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            bucket_bits=bucket_bits,
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

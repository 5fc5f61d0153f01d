"""Streaming ingest-time near-dup dedup against a GROWING corpus.

Each micro-batch of incoming documents is MinHash-signed, probed
against the persisted corpus signature index (only the batch's band
entries shuffle — the corpus contributes its stored signatures), and
split: near-dup matches are dropped, survivors are appended to the
corpus sink AND their signatures to the index, so later batches dedup
against everything accepted so far. This is the production shape of
"dedup at ingest" for a corpus that grows by streams: work per batch
scales with the batch, never with corpus².

Idempotence: both sink and index writes go to overwrite-by-batch_id
subdirectories (same pattern as events_stream.run_to_sink), so a batch
that retries after writing replaces its earlier partial output.

In-batch duplicates: survivors are also deduped against each other
(keep the lowest doc_id of each intra-batch near-dup group) — without
this, two copies arriving in ONE batch would both pass the
corpus probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dimagi_data_platform_spark.operators.minhash import (
    incremental_lsh_matches,
    lsh_candidate_pairs,
    minhash_signatures,
)


def ingest_batch_dedup(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_est_jaccard: float = 0.5,
) -> None:
    """Process one micro-batch: drop near-dups of the current index,
    drop intra-batch near-dups (lowest id survives), then append the
    survivors to ``out_path`` and their signatures to ``index_path``
    (both under overwrite-by-batch_id subdirs)."""
    from pyspark.errors import AnalysisException

    sigs = minhash_signatures(batch_df, id_col, text_col).localCheckpoint()
    try:
        corpus_sigs = spark.read.parquet(index_path)
        matches = incremental_lsh_matches(
            corpus_sigs, sigs, id_col, min_est_jaccard=min_est_jaccard
        )
        dup_ids = matches.select(F.col("batch_id").alias(id_col)).distinct()
    except AnalysisException:  # first batch: index path doesn't exist yet
        dup_ids = None

    survivors = sigs
    if dup_ids is not None:
        survivors = survivors.join(dup_ids, id_col, "left_anti")
    intra = lsh_candidate_pairs(survivors, id_col).filter(
        F.col("est_jaccard") >= min_est_jaccard
    )
    # in-batch: a doc is dropped iff it near-dups ANY lower id —
    # transitive near-dup chains collapse toward their minimum, the
    # same min-representative rule as semantic_dedup / canonical
    # cluster selection
    losers = intra.select(
        F.greatest("id_a", "id_b").alias(id_col)
    ).distinct()
    survivors = survivors.join(losers, id_col, "left_anti").localCheckpoint()

    kept_docs = batch_df.join(survivors.select(id_col), id_col, "left_semi")
    kept_docs.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")
    survivors.write.mode("overwrite").parquet(f"{index_path}/batch_id={batch_id}")


def run_ingest_dedup(
    stream_df: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    min_est_jaccard: float = 0.5,
) -> None:
    """Drain all available input through the dedup-at-ingest loop
    (availableNow), then stop."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch_dedup(
            batch_df.sparkSession,
            batch_df,
            batch_id,
            index_path,
            out_path,
            min_est_jaccard=min_est_jaccard,
        )

    (
        stream_df.writeStream.option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .foreachBatch(_process)
        .start()
        .awaitTermination()
    )

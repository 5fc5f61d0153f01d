"""Streaming ingest-time EMBEDDING near-dup dedup against a GROWING
corpus — the vector sibling of :mod:`streaming.ingest_dedup` (P27) and
the ingest companion of ``embedding_near_dup_capped`` (L5c).

Each micro-batch of incoming vectors is projection-featurized (the
shared ``project_features`` Arrow pass of operators/similarity.py),
probed against the persisted corpus projection index through a GRID
join — for every pass t, a batch row touches the corpus rows whose
quantized projection cell floor(p_t/eps) is within one cell of its
own, a banded range join in projection space (the P13 idiom), so only
grid-adjacent corpus rows shuffle — and split: rows whose exact
fold-ordered cosine against any matched corpus row reaches the
threshold are dropped, survivors append to the corpus sink AND their
features to the index, so later batches dedup against everything
accepted so far. Work per batch scales with the BATCH times the
occupancy of the touched cells, never with corpus².

Exactness split (the capped-family contract): candidate RECALL is
approximate (grid-bounded, like L5c's window), but every DROP is
exact — a row is only dropped on a verified cosine >= threshold.

Idempotence: both sink and index writes go to overwrite-by-batch_id
subdirectories (same pattern as ingest_dedup / events_stream), so a
batch that retries after writing replaces its earlier partial output.

In-batch duplicates: survivors are also grid-probed against each
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

# grid cell width in normalized-projection units: near-dups at high
# cosine project within a fraction of a cell; the width trades probe
# fan-in (3 cells per pass) against recall for moderate thresholds
DEFAULT_CELL = 0.25
N_TABLES = 8


def _cells(feats: DataFrame, cell: float, n_tables: int = N_TABLES):
    """(id, vec, t, cell) — one row per (row, pass) with the quantized
    projection cell; the probe explodes batch rows to (cell-1, cell,
    cell+1) so adjacency across a cell boundary is never missed."""
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                F.floor(F.col(f"p{t}") / F.lit(cell)).cast("long").alias(
                    "cell"
                ),
            )
            for t in range(n_tables)
        ]
    )
    return feats.select(
        "id", "vec", F.explode(entries).alias("e")
    ).select("id", "vec", F.col("e.t").alias("t"), F.col("e.cell").alias("cell"))


def _grid_matches(
    index_feats: DataFrame,
    batch_feats: DataFrame,
    threshold: float,
    cell: float = DEFAULT_CELL,
) -> DataFrame:
    """(id_a=corpus/lower id, id_b=batch id, cos_sim) for every
    grid-adjacent cross pair whose EXACT cosine reaches threshold.
    The batch side explodes to its 3-cell neighborhood (3x the BATCH,
    never the corpus) and the join runs on (t, cell)."""
    b = _cells(batch_feats, cell)
    probe = b.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vec_b"),
        "t",
        F.explode(
            F.array(F.col("cell") - 1, F.col("cell"), F.col("cell") + 1)
        ).alias("cell"),
    )
    c = _cells(index_feats, cell).select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "t", "cell"
    )
    cand = (
        probe.join(c, ["t", "cell"])
        .select("id_a", "id_b", "vec_a", "vec_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return _score_pairs_exact(cand, threshold)


def ingest_batch_embed_dedup(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    out_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    cell: float = DEFAULT_CELL,
) -> None:
    """Process one micro-batch: drop exact-cosine near-dups of the
    current index (grid-candidates, exact verify), drop intra-batch
    near-dups (lowest id survives), then append the survivors to
    ``out_path`` and their projection features to ``index_path``
    (both under overwrite-by-batch_id subdirs)."""
    from pyspark.errors import AnalysisException

    feats = project_features(batch_df, id_col, vec_col).localCheckpoint()
    try:
        index = spark.read.parquet(index_path)
        matches = _grid_matches(index, feats, threshold, cell)
        dup_ids = matches.select(F.col("id_b").alias("id")).distinct()
    except AnalysisException:  # first batch: index doesn't exist yet
        dup_ids = None

    survivors = feats
    if dup_ids is not None:
        survivors = survivors.join(dup_ids, "id", "left_anti")
    intra = _grid_matches(survivors, survivors, threshold, cell).filter(
        F.col("id_a") != F.col("id_b")
    )
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
    cell: float = DEFAULT_CELL,
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
            cell=cell,
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

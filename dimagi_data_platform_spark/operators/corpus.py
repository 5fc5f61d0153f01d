"""Training-corpus preparation pipeline — the composite LLM-data op:

  quality filter → exact dedup (normalized hash, lowest id wins)
  → near-dup removal (greedy: drop the higher id of every pair whose
    exact 3-gram Jaccard ≥ threshold)

Every stage is a DataFrame transformation; the whole pipeline is one
lazy plan (Catalyst sees through it). The near-dup stage reuses the
exact shingle-Jaccard pairs, so the pipeline is fully SQL-expressible
and sits behind the hash-checked oracle gate, unlike most "cleaning"
pipelines that can only be smoke-tested.

Scale: stages are filters/joins on (doc_id)-shuffled data; the Jaccard
pair stage dominates and is swappable for minhash_dedup_pairs (same
contract) when the corpus outgrows exact pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dimagi_data_platform_spark.functions.text import (
    punct_count,
    stopword_count,
    ws_token_count,
)
from dimagi_data_platform_spark.operators.dedup import exact_dedup


def quality_score(text_col: str = "text"):
    n_words = ws_token_count(text_col)
    punct_ratio = punct_count(text_col).cast("double") / F.length(text_col)
    stop_ratio = stopword_count(text_col).cast("double") / n_words
    return (
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(F.lit(1.0), n_words / F.lit(100.0))
    )


def prepare_corpus(
    docs: DataFrame,
    near_dup_pairs: DataFrame,
    min_quality: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Surviving documents with their quality score and content hash.

    ``near_dup_pairs`` must expose (doc_a < doc_b); the greedy policy
    keeps doc_a and drops doc_b — deterministic and order-free.
    """
    scored = docs.withColumn("quality", quality_score(text_col)).filter(
        F.col("quality") >= min_quality
    )
    deduped = exact_dedup(scored, text_col, id_col)
    losers = near_dup_pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return deduped.join(losers, id_col, "left_anti").select(
        id_col, "quality", "content_hash"
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (e.g. downweight over-represented
    languages/sources when mixing a training corpus). ``sampleBy`` is a
    scan-local filter — no shuffle, each row keeps/drops itself — so it
    scales linearly and composes with pushdown. Seeded → reproducible
    splits, but the hash is engine-specific (rows-only in the gate)."""
    return docs.sampleBy(strata_col, fractions, seed)

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


#: resolution of the keep/drop threshold — fractions quantize to 1e-6.
SAMPLE_BUCKETS = 1_000_000


def sample_bucket(id_col, seed: int):
    """Deterministic uniform bucket in [0, SAMPLE_BUCKETS) from an id.

    md5 → first 15 hex chars → 60-bit integer, identical in every
    engine (DuckDB twin: ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``),
    so hash-based sampling decisions are portable and the sampled set
    is hash-checkable — unlike ``sampleBy``, whose Bernoulli hash is
    engine-private. Still a scan-local projection: no shuffle, no state.
    """
    tagged = F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))
    h = F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")
    return h % SAMPLE_BUCKETS


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum Bernoulli sampling (e.g. downweight over-represented
    languages/sources when mixing a training corpus). A scan-local
    filter — no shuffle, each row keeps/drops itself off its own id
    hash — so it scales linearly and composes with pushdown. Seeded and
    engine-portable (see :func:`sample_bucket`): the same (id, seed)
    keeps or drops in any engine, so resamples are stable even as the
    corpus grows (a row's fate never depends on other rows, unlike
    reservoir or sort-based sampling)."""
    threshold = F.lit(None).cast("long")
    for value, frac in sorted(fractions.items()):
        bound = int(round(frac * SAMPLE_BUCKETS))
        threshold = F.when(F.col(strata_col) == value, F.lit(bound)).otherwise(threshold)
    return docs.filter(sample_bucket(id_col, seed) < threshold)

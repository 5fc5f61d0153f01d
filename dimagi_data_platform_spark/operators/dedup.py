"""Record-level dedup operators.

``latest_by_key`` is the reference's form-resubmission dedup (latest
received_on wins). ``exact_dedup`` is content-hash dedup for the LLM
pipeline (keep the lowest-id exemplar per normalized-content hash).

Scale: both are a single hash shuffle on the dedup key; the window
variant streams per partition (no sort spill beyond the partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame, keys: list[str], order_desc: list[str]
) -> DataFrame:
    """Keep one row per key: the greatest (order_desc...) tuple.

    Deterministic as long as ``order_desc`` is a total order within key
    groups (callers append a unique id).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_desc])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def normalized_text(col) -> Column:
    """Whitespace-collapsed, lower-cased text — shared by exact dedup
    and fingerprinting so both sides of the gate agree."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact normalized content (md5)."""
    hashed = df.withColumn("content_hash", F.md5(normalized_text(text_col)))
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col))
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

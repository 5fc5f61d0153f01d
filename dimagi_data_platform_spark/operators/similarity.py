"""Similarity search over embedding columns.

- ``knn_bruteforce``: exact cosine top-k; the small query set is
  broadcast so the big side streams — the correctness baseline.
- ``knn_lsh``: random-hyperplane LSH buckets both sides, exact cosine
  re-rank within buckets — the 100 TB scale path (candidate volume
  ~ n / 2^planes per query instead of n).

Hyperplanes are generated from a fixed seed (deterministic plans).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dimagi_data_platform_spark.functions.vectors import cosine, dot


def knn_bruteforce(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors for every query vector (excluding self).

    Returns (q_id, neighbor_id, cos_sim, rank). Deterministic: ties
    break on neighbor_id.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = items.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    joined = F.broadcast(q).crossJoin(c).filter(F.col("q_id") != F.col("neighbor_id"))
    scored = joined.withColumn("cos_sim", cosine("q_vec", "c_vec"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col, dim: int, n_planes: int, seed: int = 7):
    """Sign-bit bucket id (0..2^n_planes-1) for a vector column."""
    bucket = F.lit(0)
    for i, plane in enumerate(_planes(dim, n_planes, seed)):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bucket = bucket + F.when(dot(vec_col, p) > 0, F.lit(1 << i)).otherwise(0)
    return bucket


def knn_lsh(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    Recall < 1 by design; tested against knn_bruteforce. At scale,
    bucket the big side once (write bucketed) and reuse across queries.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(vec_col, dim, n_planes, seed).alias("bucket"),
    )
    c = items.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket(vec_col, dim, n_planes, seed).alias("bucket"),
    )
    joined = F.broadcast(q).join(c, "bucket").filter(F.col("q_id") != F.col("neighbor_id"))
    scored = joined.withColumn("cos_sim", cosine("q_vec", "c_vec"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dup_pairs(
    items: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold (exact).

    O(n²/2) compare — correct baseline; the LSH bucketing above is the
    scale path (bucket first, compare within buckets).
    """
    a = items.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = items.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos_sim", cosine("vec_a", "vec_b"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )

"""Similarity search over embedding columns.

- ``knn_bruteforce``: exact cosine top-k; the small query set is
  broadcast so the big side streams — the correctness baseline.
- ``knn_lsh``: random-hyperplane LSH buckets both sides, exact cosine
  re-rank within buckets — the 100 TB scale path (candidate volume
  ~ n / 2^planes per query instead of n).
- ``embedding_near_dup_pairs``: exact all-pairs cosine threshold.

All dot products are fixed-dim unrolled codegen expressions
(functions.vectors.dot_fixed) and norms are computed ONCE per side
before the pairwise join — never per pair.

Hyperplanes are generated from a fixed seed (deterministic plans).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dimagi_data_platform_spark.functions.vectors import dot_fixed, norm_fixed

DEFAULT_DIM = 64


def knn_bruteforce(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Top-k cosine neighbors for every query vector (excluding self).

    Returns (q_id, neighbor_id, cos_sim, rank). Deterministic: ties
    break on neighbor_id.
    """
    par = items.sparkSession.sparkContext.defaultParallelism
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        norm_fixed(vec_col, dim).alias("q_norm"),
    )
    # repartition the streamed side: a small parquet arrives as one
    # split, which would serialize the whole pairwise loop in one task
    c = items.repartition(par).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_fixed(vec_col, dim).alias("c_norm"),
    )
    joined = F.broadcast(q).crossJoin(c).filter(F.col("q_id") != F.col("neighbor_id"))
    cos = dot_fixed("q_vec", "c_vec", dim) / (F.col("q_norm") * F.col("c_norm"))
    scored = joined.withColumn("cos_sim", cos)
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
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0)
    for i, plane in enumerate(_planes(dim, n_planes, seed)):
        d = F.lit(0.0)
        for j, p in enumerate(plane):
            d = d + v.getItem(j).cast("double") * F.lit(p)
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(0)
    return bucket


def knn_lsh(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
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
        norm_fixed(vec_col, dim).alias("q_norm"),
        lsh_bucket(vec_col, dim, n_planes, seed).alias("bucket"),
    )
    c = items.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_fixed(vec_col, dim).alias("c_norm"),
        lsh_bucket(vec_col, dim, n_planes, seed).alias("bucket"),
    )
    joined = F.broadcast(q).join(c, "bucket").filter(F.col("q_id") != F.col("neighbor_id"))
    cos = dot_fixed("q_vec", "c_vec", dim) / (F.col("q_norm") * F.col("c_norm"))
    scored = joined.withColumn("cos_sim", cos)
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
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold (exact).

    O(n²/2) compare with codegen'd unrolled dot — correct baseline; the
    LSH bucketing above is the scale path (bucket first, compare within
    buckets).
    """
    par = items.sparkSession.sparkContext.defaultParallelism
    # streamed side must be repartitioned: one parquet split would run
    # the whole O(n²) loop in a single task
    a = items.repartition(par).select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        norm_fixed(vec_col, dim).alias("norm_a"),
    )
    b = items.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        norm_fixed(vec_col, dim).alias("norm_b"),
    )
    # broadcast b so the repartitioned a side streams in parallel
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    cos = dot_fixed("vec_a", "vec_b", dim) / (F.col("norm_a") * F.col("norm_b"))
    return (
        pairs.withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )

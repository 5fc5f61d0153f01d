"""PCA for embedding columns: distributed covariance + driver-side
eigensolve + distributed projection.

The scalable shape for dimensionality reduction over an
``array<float>`` column (compression before ANN, whitening before
clustering, Matryoshka-style truncation studies): the only distributed
work is (1) one pass accumulating the d×d scatter matrix and (2) one
pass projecting rows; the eigensolve happens on the DRIVER on a d×d
matrix (d = embedding dim, 64 here — bounded, independent of corpus
size), the same split Spark MLlib's PCA uses.

Determinism: float matrix accumulation is partition-order dependent, so
scatter sums here are computed on per-component QUANTIZED integers
(floor(x·2^20)) — per-partition int64 X_qᵀX_q blocks summed exactly —
making the covariance, and therefore the components, bit-identical
across partitionings. numpy's ``eigh`` on the identical matrix returns
identical components; sign is fixed by forcing each component's
largest-|coefficient| entry positive.

Envelope: |x| < 2³¹ per component and n·(x·2²⁰)² < 2⁶³ per partition
pair-sum — for unit-normalized embeddings that allows ~8e3 rows per
partition per 2²⁰ quantization at d=64; repartition finer or lower the
quantization for bigger batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCA_Q = 1 << 20


def _scatter_sums(items: DataFrame, vec_col: str, dim: int) -> tuple:
    """Exact int64 scatter accumulation: returns (n, s[dim], C[dim,dim])
    of quantized components."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = np.zeros((dim, dim), dtype=np.int64)
        s = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Xq = np.floor(X * PCA_Q).astype(np.int64)
            C += Xq.T @ Xq
            s += Xq.sum(axis=0)
            n += len(Xq)
        flat = np.concatenate([[n], s, C.ravel()])
        yield pd.DataFrame(
            {"idx": np.arange(len(flat), dtype=np.int64), "val": flat}
        )

    sums = (
        items.select(vec_col)
        .mapInPandas(kernel, schema="idx long, val long")
        .groupBy("idx")
        .agg(F.sum("val").cast("long").alias("val"))
        .collect()
    )
    vals = np.zeros(1 + dim + dim * dim, dtype=np.int64)
    for r in sums:
        vals[r.idx] = r.val
    n = int(vals[0])
    s = vals[1 : 1 + dim]
    C = vals[1 + dim :].reshape(dim, dim)
    return n, s, C


def pca_components(
    items: DataFrame, k: int, vec_col: str = "embedding", dim: int = 64
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean[dim], components[k, dim], explained_variance[k]) of the
    top-k principal axes. Driver work is O(d³) on a d×d matrix."""
    n, s, C = _scatter_sums(items, vec_col, dim)
    if n < 2:
        raise ValueError("PCA needs at least 2 rows")
    mean_q = s / n
    # covariance of quantized values; /Q² rescales to input units
    cov = (C - np.outer(mean_q, s)) / (n - 1) / (PCA_Q * PCA_Q)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    # deterministic sign: largest-|coeff| entry of each component > 0
    for i in range(comps.shape[0]):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean_q / PCA_Q, comps, evals[order]


def pca_project(
    items: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pca_vec",
    dim: int = 64,
) -> DataFrame:
    """(id_col, out_col: array<double>[k]) — rows centered with the
    training mean and projected onto the top-k components. Projection
    is one Arrow pass with the (k×d) component matrix broadcast."""
    mean, comps, _ = pca_components(items, k, vec_col, dim)
    bc = items.sparkSession.sparkContext.broadcast((mean, comps))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, W = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = (X - m) @ W.T
            yield pd.DataFrame(
                {"__id": pdf[id_col].to_numpy(), out_col: list(P)}
            )

    return items.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"__id long, {out_col} array<double>"
    ).withColumnRenamed("__id", id_col)

"""Compression-ratio text signals — the "gzip filter" pretraining
pipelines use as a cheap, language-agnostic quality/repetition probe
(highly compressible text is boilerplate/templated/repetitive; nearly
incompressible text is often binary junk or high-entropy noise).

Spark-first shape: an Arrow-batched ``mapInPandas`` pass (zlib is
CPU-bound C code — the Python-worker transfer is amortized over
batches, and the computation is embarrassingly scan-local). No oracle
twin: DuckDB has no zlib surface, so the gate is unit tests pinning
exact ratios on known inputs (zlib output is deterministic for a fixed
level/strategy) plus the monotonicity property repetitive < random.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def with_compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compress_ratio",
    level: int = 6,
) -> DataFrame:
    """Append ``out_col`` = len(zlib(text)) / len(text) (UTF-8 bytes;
    empty text → NULL). Ratios ≪ 1 flag repetitive/templated docs,
    ratios near/above 1 flag high-entropy or binary-ish content —
    both standard drop rules in corpus prep."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    # a FRESH StructType: StructType.add mutates in place, and sharing
    # the input df's schema object corrupts its logical plan
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # mask nulls BEFORE astype: astype(str) turns a NULL cell
            # into the literal string 'None' (4 bogus bytes); empty
            # string degrades to NULL via the n > 0 guard below, so
            # NULL text must take the same path (ADVICE r7)
            raw = (
                pdf[text_col]
                .where(pdf[text_col].notna(), "")
                .astype(str)
                .str.encode("utf-8")
            )
            n = raw.str.len()
            comp = raw.map(lambda b: len(zlib.compress(b, level)))
            pdf = pdf.copy()
            pdf[out_col] = comp / n.where(n > 0)
            yield pdf

    return df.mapInPandas(score, schema=schema)


def compressibility_filter(
    df: DataFrame,
    text_col: str = "text",
    min_ratio: float = 0.25,
    max_ratio: float = 1.1,
    level: int = 6,
) -> DataFrame:
    """Drop documents outside the [min_ratio, max_ratio] band — the
    C4/Gopher-companion hygiene rule expressed on compressibility."""
    from pyspark.sql import functions as F

    out = with_compression_ratio(df, text_col, "_cr", level)
    return (
        out.filter(
            F.col("_cr").isNotNull()
            & (F.col("_cr") >= min_ratio)
            & (F.col("_cr") <= max_ratio)
        ).drop("_cr")
    )

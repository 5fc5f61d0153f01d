"""Subword tokenizer APPLICATION: greedy longest-match WordPiece.

The BPE side of tokenizer *training* lives in plans/queries.py
(bpe_pair_counts — the pair-frequency statistic each merge iteration
maximizes); this module is the inference half: encode text against a
FIXED vocabulary, the per-document step a training-data pipeline runs
to get true token counts / ids for packing and budgeting.

Greedy longest-match WordPiece (the BERT tokenizer's algorithm): each
whitespace word is consumed left-to-right, always taking the longest
vocab entry that matches; non-initial pieces carry the ``##``
continuation prefix; a word with any unmatchable position becomes
``[UNK]``.

Scale posture: the algorithm is inherently per-row Python, so it runs
as an Arrow-batched ``mapInPandas`` kernel — one Python invocation per
record batch, never per row — and the vocabulary ships once per
executor via ``SparkContext.broadcast``, not once per task closure.
Everything else (counts, budgets) should stay JVM-side downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)

UNK = "[UNK]"


def encode_word(word: str, vocab: frozenset[str], max_word_len: int = 100) -> list[str]:
    """Greedy longest-match pieces for one word (pure function —
    driver-side unit-testable without Spark)."""
    if not word:
        return []
    if len(word) > max_word_len:
        return [UNK]
    pieces: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces


def wordpiece_encode(
    df: DataFrame,
    text_col: str,
    vocab: frozenset[str] | set[str],
    out_col: str = "pieces",
    max_word_len: int = 100,
) -> DataFrame:
    """Append ``out_col: array<string>`` with the WordPiece encoding of
    lower-cased, whitespace-split ``text_col``."""
    vocab_bc = df.sparkSession.sparkContext.broadcast(frozenset(vocab))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<string>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = vocab_bc.value
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                [
                    p
                    for w in (t or "").lower().split()
                    for p in encode_word(w, v, max_word_len)
                ]
                for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)

"""L71: compression-ratio quality signals — exact ratios pinned
against direct zlib calls (deterministic for a fixed level), the
repetitive < varied < incompressible monotonicity, and NULL/empty
safety."""

from __future__ import annotations

import hashlib
import zlib

import pytest
from pyspark.sql import functions as F

from dimagi_data_platform_spark.functions.compression import (
    compressibility_filter,
    with_compression_ratio,
)

REPETITIVE = "spam " * 400
# varied text: a deterministic non-repeating hex stream (16-symbol
# alphabet -> zlib lands ~0.55, inside the keep band like real prose)
VARIED = " ".join(
    hashlib.sha256(str(i).encode()).hexdigest() for i in range(64)
)
# short junk doc: zlib header overhead dominates -> ratio > 1
SHORT_JUNK = "zq!7#"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, REPETITIVE), (2, VARIED), (3, SHORT_JUNK), (4, "")]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_ratios_match_direct_zlib(spark, docs):
    got = {
        r["doc_id"]: r["compress_ratio"]
        for r in with_compression_ratio(docs).collect()
    }
    for doc_id, text in [(1, REPETITIVE), (2, VARIED), (3, SHORT_JUNK)]:
        raw = text.encode("utf-8")
        assert got[doc_id] == len(zlib.compress(raw, 6)) / len(raw)
    assert got[4] is None


def test_monotonicity_repetitive_lt_varied_lt_junk(spark, docs):
    got = {
        r["doc_id"]: r["compress_ratio"]
        for r in with_compression_ratio(docs).collect()
    }
    assert got[1] < got[2] < got[3]
    assert got[1] < 0.1   # "spam spam ..." compresses ~70x
    assert got[3] > 1.0   # header overhead on a 5-char doc


def test_filter_drops_both_tails(spark, docs):
    kept = {r["doc_id"] for r in compressibility_filter(docs).collect()}
    assert kept == {2}  # varied text survives; both tails + empty drop


def test_schema_and_partitioning_stable(spark, docs):
    out = with_compression_ratio(docs.repartition(3))
    assert out.columns == ["doc_id", "text", "compress_ratio"]
    a = sorted((r["doc_id"], r["compress_ratio"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["compress_ratio"])
        for r in with_compression_ratio(docs.repartition(1)).collect()
    )
    assert a == b


def test_real_corpus_lands_in_band(spark):
    """The synthetic corpus should mostly survive the default band —
    the filter is a TAIL remover, not a decimator."""
    from dimagi_data_platform_spark.catalog import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    n = docs.count()
    kept = compressibility_filter(docs).count()
    assert kept >= int(0.5 * n)


def test_null_text_degrades_to_null(spark):
    """NULL text must yield a NULL ratio like empty text — not the
    4-byte ratio of the literal string 'None' (ADVICE r7)."""
    rows = [(1, None), (2, "")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["compress_ratio"]
        for r in with_compression_ratio(df).collect()
    }
    assert got[1] is None and got[2] is None

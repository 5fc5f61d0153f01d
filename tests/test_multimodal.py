"""Multimodal plumbing: binary payload column + mapInPandas decode."""

from __future__ import annotations

from pyspark.sql import functions as F

from dimagi_data_platform_spark.multimodal.binary_ops import (
    attach_binary_payload,
    extract_features,
)


def test_payload_roundtrip_and_features(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 1000), (3, "")],
        "doc_id long, text string",
    )
    feats = {r.doc_id: r for r in extract_features(attach_binary_payload(docs)).collect()}
    assert feats[1].n_bytes == 11
    assert feats[1].first_byte == ord("h")
    assert feats[2].n_bytes == 1000
    assert feats[2].width == 1000 % 640 and feats[2].height == 1000 % 480
    assert feats[3].n_bytes == 0 and feats[3].first_byte == -1


def test_payload_is_binary_type(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    df = attach_binary_payload(docs)
    assert dict(df.dtypes)["payload"] == "binary"
    raw = df.select("payload").collect()[0].payload
    assert bytes(raw) == b"abc"


def test_extract_features_partitioning_preserved(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    ).repartition(8)
    out = extract_features(attach_binary_payload(docs))
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 100


def test_resize_images_contract(spark):
    """Resize plumbing: exact output size, deterministic bytes across
    partitionings, empty-payload safety."""
    from dimagi_data_platform_spark.multimodal.binary_ops import (
        attach_binary_payload,
        resize_images,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 10), (2, "abcdefghijklmnopqrstuvwxyz" * 400), (3, "")],
        ["doc_id", "text"],
    )
    out = resize_images(attach_binary_payload(docs), width=8, height=8)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["out_bytes"] == 64  # upsampled by repetition
    assert rows[2]["out_bytes"] == 64  # stride-sampled down
    assert rows[3]["out_bytes"] == 0  # empty payload passes through
    assert rows[1]["payload"] == b"x" * 64
    # deterministic across partition layouts
    out2 = resize_images(
        attach_binary_payload(docs.repartition(7)), width=8, height=8
    )
    rows2 = {r["doc_id"]: r["payload"] for r in out2.collect()}
    assert {k: r["payload"] for k, r in rows.items()} == rows2

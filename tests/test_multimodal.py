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


def test_chunk_audio_offsets_and_coverage(spark):
    from dimagi_data_platform_spark.multimodal.binary_ops import chunk_audio

    docs = spark.createDataFrame(
        [(1, "a" * 100_000), (2, "b" * 10), (3, "")],
        "doc_id long, text string",
    )
    # 1 ms of "audio" = 32 bytes at 16kHz/16-bit; chunk_ms=1000 -> 32k bytes
    rows = chunk_audio(
        attach_binary_payload(docs), chunk_ms=1000
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 100_000 bytes -> ceil(100000/32000) = 4 chunks, offsets
    # contiguous, byte coverage exact
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in c1] == [0, 1, 2, 3]
    assert sum(r.chunk_bytes for r in c1) == 100_000
    assert c1[0].start_ms == 0 and c1[0].end_ms == 1000
    assert c1[-1].chunk_bytes == 100_000 - 3 * 32_000
    for a, b in zip(c1, c1[1:]):
        assert b.start_ms == a.end_ms
    # rms signature is the deterministic byte sum of the slice
    assert c1[0].rms_sig == ord("a") * 32_000
    # doc 2: short clip -> one partial chunk; doc 3: empty -> no rows
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_bytes == 10
    assert 3 not in by_doc


def test_decoder_injection_through_public_surface(spark):
    """VERDICT r12 item 7: the decode callable is a documented
    parameter of the public operators — inject a custom decoder and
    observe its metadata end-to-end, without touching module
    internals; the deterministic fake stays the default."""

    def _stub_px_decoder(payload: bytes) -> dict:
        # pure local callable meeting the fake_decode_bytes contract
        # (cloudpickled by value — test modules aren't importable on
        # executors): every payload becomes a fixed 2x2 'image'
        # fingerprinted by its last byte
        n = len(payload)
        return {
            "n_bytes": n,
            "width": 2,
            "height": 2,
            "n_frames": 1,
            "first_byte": payload[-1] if n else -1,
        }

    from dimagi_data_platform_spark.multimodal.binary_ops import (
        attach_binary_payload,
        extract_features,
        fake_decode_bytes,
        sample_frames,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    payloads = attach_binary_payload(docs)
    got = {r.doc_id: r for r in
           extract_features(payloads, decoder=_stub_px_decoder).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert got
    for did, r in got.items():
        raw = texts[did].encode("utf-8")
        assert (r.width, r.height, r.n_frames) == (2, 2, 1)
        assert r.first_byte == (raw[-1] if raw else -1)
    # default is unchanged: the fake decoder's metadata
    dflt = {r.doc_id: r for r in extract_features(payloads).collect()}
    for did, r in dflt.items():
        assert r.width == fake_decode_bytes(texts[did].encode())["width"]
    # frames honor the injected frame count (1 frame -> 1 row per doc)
    fr = sample_frames(payloads, decoder=_stub_px_decoder)
    assert fr.count() == len(texts)

"""Multimodal binary-column plumbing.

Images/audio/video travel as opaque ``binary`` payload columns with
typed metadata. The Spark-side plumbing — schema, Arrow batching,
``mapInPandas`` signature, partition behavior — is real and tested; the
decode step itself is a DETERMINISTIC FAKE because no image/audio codec
libraries exist in this container. Swap ``_fake_decode_bytes`` for a
real decoder (PIL/ffmpeg) without touching the plumbing.

Scale: mapInPandas streams Arrow batches; payload bytes never hit the
driver. Feature extraction is embarrassingly parallel — partition count
is inherited from the scan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, n_frames long, first_byte long"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in ingestion: encode text as the opaque binary payload."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def fake_decode_bytes(payload: bytes) -> dict:
    """DETERMINISTIC FAKE decoder (no codec libs in container) — the
    DEFAULT value of every operator's ``decoder`` parameter.

    A real implementation would parse the container format; this derives
    stable pseudo-metadata from the byte stream so the full pipeline is
    testable end-to-end (and SQL-checkable).

    Decoder contract (the r13 injection seam, VERDICT r12 item 7): a
    PURE picklable callable ``bytes -> dict`` returning the keys
    ``n_bytes, width, height, n_frames, first_byte`` as ints. It is
    cloudpickled into executors by ``mapInPandas`` — pass a module-level
    function (a PIL/ffmpeg wrapper in production), never a closure over
    a SparkSession or other driver state.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640,
        "height": n % 480,
        "n_frames": n % 30 + 1,
        "first_byte": payload[0] if n else -1,
    }


#: backwards-compat alias (pre-r13 name)
_fake_decode_bytes = fake_decode_bytes


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    decoder: Callable[[bytes], dict] = fake_decode_bytes,
) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    ``decoder`` is the injection seam: any callable meeting the
    :func:`fake_decode_bytes` contract (pure, picklable, returns the
    FEATURE_SCHEMA metadata keys) — swap in a real PIL/ffmpeg decoder
    without touching the plumbing; the fake stays the default so the
    pipeline is deterministic and SQL-checkable in this container."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pd.DataFrame([decoder(p) for p in pdf["payload"]])
            feats.insert(0, "doc_id", pdf[id_col].values)
            yield feats

    return df.select(id_col, "payload").mapInPandas(_extract, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_off long, frame_sig long"


def sample_frames(
    df: DataFrame,
    every: int = 8,
    id_col: str = "doc_id",
    decoder: Callable[[bytes], dict] = fake_decode_bytes,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame of each payload
    (the video → frames explode pattern). Frame count comes from the
    fake decoder; the per-frame "signature" is a stable byte slice
    checksum so the whole pipeline stays SQL-checkable. Swap the body
    for real frame extraction (ffmpeg) without touching the contract.

    Scale: output fan-out is rows x frames/every — the explode happens
    executor-side inside the Arrow batch, never on the driver.
    """

    def _frames(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_off": [], "frame_sig": []}
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                meta = decoder(payload)
                n = len(payload)
                for idx in range(0, meta["n_frames"], every):
                    off = (idx * 997) % n if n else 0
                    sig = sum(payload[off : off + 16]) if n else -1
                    out["doc_id"].append(did)
                    out["frame_idx"].append(idx)
                    out["frame_off"].append(off)
                    out["frame_sig"].append(sig)
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(_frames, FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, payload binary, out_width long, out_height long, out_bytes long"
)


def resize_images(
    df: DataFrame, width: int = 64, height: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Image resize over the binary payload column — the
    decode → resample → re-encode pattern, as Arrow-batched
    ``mapInPandas``. The resample kernel is a DETERMINISTIC FAKE
    (stride-sampled byte stream sized to width*height; no codec libs in
    this container): swap the body for a real PIL/libvips resize
    without touching the schema, batching, or partition contract.

    Scale: pure per-row transform inside Arrow batches — no shuffle,
    partitioning inherited from the scan; output payload size is
    bounded by width*height regardless of input size (the property
    that makes resize-on-ingest the standard storage-diet step).
    """
    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "payload": [],
                "out_width": [],
                "out_height": [],
                "out_bytes": [],
            }
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                n = len(payload)
                if n == 0:
                    resized = b""
                elif n >= target:
                    # stride-sample down to exactly target bytes
                    stride = n / target
                    resized = bytes(
                        payload[int(i * stride)] for i in range(target)
                    )
                else:
                    # upsample by repetition, then trim
                    resized = (payload * (target // n + 1))[:target]
                out["doc_id"].append(did)
                out["payload"].append(resized)
                out["out_width"].append(width)
                out["out_height"].append(height)
                out["out_bytes"].append(len(resized))
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(_resize, RESIZE_SCHEMA)


CHUNK_SCHEMA = (
    "doc_id long, chunk_idx long, start_ms long, end_ms long, "
    "chunk_bytes long, rms_sig long"
)


def chunk_audio(
    df: DataFrame,
    chunk_ms: int = 10_000,
    sample_rate: int = 16_000,
    bytes_per_sample: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Audio segmentation: one output row per fixed-duration chunk of
    each payload — the audio twin of :func:`sample_frames` and the
    standard pre-step for ASR/TTS training pipelines (long recordings
    become model-sized windows with millisecond offsets).

    Duration is derived from byte length via the declared PCM geometry
    (sample_rate * bytes_per_sample per second); the per-chunk "rms"
    signature is a DETERMINISTIC FAKE (byte-sum over the chunk slice —
    no audio codec libs in this container). Swap the signature line for
    a real decode+RMS without touching the schema, batching, offsets,
    or partition contract.

    Scale: fan-out is duration/chunk_ms rows per recording, produced
    executor-side inside Arrow batches; payload bytes never leave the
    executor, and downstream per-chunk work (VAD, transcription)
    parallelizes over the exploded rows.
    """
    bytes_per_ms = sample_rate * bytes_per_sample / 1000.0
    chunk_bytes = int(chunk_ms * bytes_per_ms)

    def _chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "chunk_idx": [],
                "start_ms": [],
                "end_ms": [],
                "chunk_bytes": [],
                "rms_sig": [],
            }
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                n = len(payload)
                n_chunks = max(1, -(-n // chunk_bytes)) if n else 0
                for idx in range(n_chunks):
                    lo = idx * chunk_bytes
                    hi = min(n, lo + chunk_bytes)
                    out["doc_id"].append(did)
                    out["chunk_idx"].append(idx)
                    out["start_ms"].append(int(lo / bytes_per_ms))
                    out["end_ms"].append(int(hi / bytes_per_ms))
                    out["chunk_bytes"].append(hi - lo)
                    out["rms_sig"].append(sum(payload[lo:hi]))
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(_chunks, CHUNK_SCHEMA)

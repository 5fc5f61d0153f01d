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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, n_frames long, first_byte long"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in ingestion: encode text as the opaque binary payload."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _fake_decode_bytes(payload: bytes) -> dict:
    """DETERMINISTIC FAKE decoder (no codec libs in container).

    A real implementation would parse the container format; this derives
    stable pseudo-metadata from the byte stream so the full pipeline is
    testable end-to-end (and SQL-checkable).
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640,
        "height": n % 480,
        "n_frames": n % 30 + 1,
        "first_byte": payload[0] if n else -1,
    }


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over the binary payload column."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pd.DataFrame([_fake_decode_bytes(p) for p in pdf["payload"]])
            feats.insert(0, "doc_id", pdf[id_col].values)
            yield feats

    return df.select(id_col, "payload").mapInPandas(_extract, FEATURE_SCHEMA)

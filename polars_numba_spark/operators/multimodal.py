"""Multimodal column support: opaque binary payloads + typed metadata.

Convention: a multimodal asset is a ``binary`` payload column next to a
``struct`` metadata column (mime, n_bytes, and per-modality fields). The
Spark-side plumbing — schema contracts, Arrow batch shape, ``mapInPandas``
feature extraction, partition sizing — is real and tested; the actual
codec step (image decode / audio resample / video frame-sample) is STUBBED
because no media libraries exist in this container:

- :func:`decode_image_stub` raises ``NotImplementedError`` when asked for a
  real decode, exactly where a Pillow/libvips call would slot in;
- ``fake=True`` derives deterministic pseudo-features from the payload bytes
  so the full pipeline (including the oracle-checked catalog query) runs
  end-to-end.

Scale notes: payloads ride through Arrow as zero-copy binary buffers;
``mapInPandas`` batch size is governed by ``maxRecordsPerBatch`` — for
multi-MB payloads set it low (e.g. 64) to bound worker memory; feature
extraction parallelizes per partition with no shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes int, width int, height int, phash string"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload builder: treats UTF-8 text bytes as the opaque binary
    asset (the testdata ships no real media; the plumbing is identical)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ),
    )


def decode_image_stub(payload: bytes, fake: bool = True) -> tuple[int, int, str]:
    """Codec slot. Real decode is NotImplemented in this container; the fake
    path derives deterministic pseudo-dimensions and a perceptual-hash stand-
    in from the payload bytes (md5-seeded), so downstream plumbing is
    exercised with stable values."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires a media library (Pillow/libvips) "
            "not present in this environment"
        )
    digest = hashlib.md5(payload).hexdigest()
    n = len(payload)
    width = 64 + (n % 577)
    height = 64 + ((n * 7) % 421)
    return width, height, digest[:16]


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over payloads via ``mapInPandas`` (Arrow-batched,
    partition-parallel, shuffle-free)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [int(m["n_bytes"]) for m in pdf["meta"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "phash": [f[2] for f in feats],
                }
            )

    return df.select("doc_id", "payload", "meta").mapInPandas(run, FEATURE_SCHEMA)

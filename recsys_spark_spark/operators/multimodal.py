"""Multimodal column plumbing (BASELINE north star: image/audio/video
as opaque binary columns with typed metadata).

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (`decode_image` / `decode_audio` raise
NotImplementedError); everything Spark-side is REAL and tested:

- the canonical schema (id, modality, content BINARY, meta struct);
- Arrow-batched ``mapInPandas`` feature extraction over binary
  columns (bytes cross the JVM→Python boundary once per batch, not
  per row);
- one-to-many frame sampling (the video-frame-extraction shape: each
  input row yields n output rows from slices of the binary payload).

Feature values are computed with hashlib/byte arithmetic so they are
deterministic and — for an ASCII corpus — reproducible by the DuckDB
oracle from the text column (plans/mm.py).

Scale notes: binary payloads never shuffle here — both operators are
narrow maps; partition sizing is governed by
``spark.sql.files.maxPartitionBytes`` against the blob column size,
and the output of frame sampling multiplies rows, not bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 64
FRAME_EVERY = 2


def decode_image(content: bytes):  # pragma: no cover - stub by design
    """STUB: real image decoding needs pillow/opencv, which are not in
    this environment.  The Spark-side contract (binary in, array/struct
    out via mapInPandas) is exercised by `binary_features` /
    `frame_samples` with deterministic byte math instead."""
    raise NotImplementedError(
        "STUB: image decode requires an image codec (pillow); "
        "not available in this environment"
    )


def decode_audio(content: bytes):  # pragma: no cover - stub by design
    """STUB: see decode_image."""
    raise NotImplementedError(
        "STUB: audio decode requires an audio codec (soundfile); "
        "not available in this environment"
    )


def with_binary_content(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Demo payload builder: the document text UTF-8-encoded into a
    BINARY ``content`` column with modality metadata — the schema a
    real pipeline would get from reading image/audio bytes."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.lit("text").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.length(text_col).cast("int").alias("n_chars"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def binary_features(df: DataFrame) -> DataFrame:
    """(id, modality, n_bytes, content_md5) via Arrow-batched
    mapInPandas — the feature-extraction harness a real decoder would
    plug into (swap the hashlib body for pillow/librosa calls)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads are real inputs (permissive JSONL reads
            # null the data columns of corrupt rows) — quarantine by
            # skipping, never crash the job with bytes(None)
            pdf = pdf[pdf["content"].notna()]
            out = pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(bytes(b)) for b in pdf["content"]],
                    "content_md5": [
                        hashlib.md5(bytes(b)).hexdigest() for b in pdf["content"]
                    ],
                }
            )
            yield out

    return df.mapInPandas(
        extract, "id long, modality string, n_bytes long, content_md5 string"
    )


def frame_samples(
    df: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    every: int = FRAME_EVERY,
) -> DataFrame:
    """One-to-many frame sampling: slice the payload into fixed-size
    frames, keep every ``every``-th, fingerprint each — the video
    frame-extraction shape (a real pipeline would decode and resize
    each frame here instead of hashing it)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for did, content in zip(pdf["id"], pdf["content"]):
                if content is None:  # see binary_features NULL note
                    continue
                b = bytes(content)
                n_frames = max((len(b) + frame_bytes - 1) // frame_bytes, 1)
                for i in range(0, n_frames, every):
                    ids.append(did)
                    idxs.append(i)
                    sigs.append(
                        hashlib.md5(
                            b[i * frame_bytes : (i + 1) * frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_md5": sigs})

    return df.mapInPandas(sample, "id long, frame_idx int, frame_md5 string")


#: fake-resize output geometry (bytes; stands in for pixels)
RESIZE_W = 8
RESIZE_H = 8


def resize_frames(
    df: DataFrame, width: int = RESIZE_W, height: int = RESIZE_H
) -> DataFrame:
    """Image-resize harness: (id, width, height, resized_md5) via
    Arrow-batched mapInPandas — the third mapInPandas shape the
    multimodal family needs next to 1:1 features and 1:many frame
    sampling (a real pipeline decodes, resizes with pillow/opencv,
    and re-encodes here).

    DETERMINISTIC FAKE for the stubbed decode (no codecs in this
    environment): the payload is truncated / zero-padded to
    width×height bytes — a stand-in with the same data-flow shape
    (bounded output size regardless of input size) so the schema,
    batching, NULL quarantine, and downstream joins are all real and
    tested.  Swap the body for decode_image → resize → encode when a
    codec is available."""
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["content"].notna()]  # NULL quarantine
            out_bytes = [
                (bytes(b)[:target]).ljust(target, b"\0")
                for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": width,
                    "height": height,
                    "resized_md5": [
                        hashlib.md5(b).hexdigest() for b in out_bytes
                    ],
                }
            )

    return df.mapInPandas(
        resize, "id long, width int, height int, resized_md5 string"
    )

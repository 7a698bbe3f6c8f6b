"""Multimodal-column queries (BASELINE north star).

The binary payload here is the UTF-8 document text (the corpus is
ASCII, so the DuckDB oracle reproduces byte math from the text
column); the Spark side runs the REAL binary path — encode → Arrow
batch → mapInPandas byte slicing/hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    FRAME_BYTES,
    FRAME_EVERY,
    binary_features,
    frame_samples,
    with_binary_content,
)
from ..sources.readers import table
from .registry import register


@register(
    "multimodal_features",
    oracle="""
SELECT doc_id AS id, 'text' AS modality,
       CAST(length(text) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary feature extraction through mapInPandas (the decode-stage
    harness; oracle reproduces the byte math from the ASCII text)."""
    docs = table(spark, sf_dir, "documents")
    return binary_features(with_binary_content(docs))


@register(
    "multimodal_frame_samples",
    oracle=f"""
WITH frames AS (
  SELECT doc_id AS id, ff.i AS frame_idx,
         md5(substr(text, CAST(ff.i AS INTEGER) * {FRAME_BYTES} + 1, {FRAME_BYTES}))
           AS frame_md5
  FROM documents,
       UNNEST(generate_series(
         0, greatest((length(text) + {FRAME_BYTES - 1}) // {FRAME_BYTES}, 1) - 1))
         AS ff(i)
)
SELECT id, CAST(frame_idx AS INTEGER) AS frame_idx, frame_md5
FROM frames WHERE frame_idx % {FRAME_EVERY} = 0
""",
)
def multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many frame sampling through mapInPandas (the video
    frame-extraction shape)."""
    docs = table(spark, sf_dir, "documents")
    return frame_samples(with_binary_content(docs))

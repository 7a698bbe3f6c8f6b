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
from .registry import register_demoted


@register_demoted(
    "multimodal_features_frames",
    oracle=f"""
WITH feats AS (
  SELECT doc_id AS id, 'text' AS modality,
         CAST(length(text) AS BIGINT) AS n_bytes,
         md5(text) AS content_md5
  FROM documents
),
frames AS (
  SELECT doc_id AS id, ff.i AS frame_idx,
         md5(substr(text, CAST(ff.i AS INTEGER) * {FRAME_BYTES} + 1, {FRAME_BYTES}))
           AS frame_md5
  FROM documents,
       UNNEST(generate_series(
         0, greatest((length(text) + {FRAME_BYTES - 1}) // {FRAME_BYTES}, 1) - 1))
         AS ff(i)
)
SELECT f.id, f.modality, f.n_bytes, f.content_md5,
       CAST(fr.frame_idx AS INTEGER) AS frame_idx, fr.frame_md5
FROM feats f JOIN frames fr ON fr.id = f.id
WHERE fr.frame_idx % {FRAME_EVERY} = 0
""",
)
def multimodal_features_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode harness, both shapes in one query (merged
    from the former multimodal_features + multimodal_frame_samples
    registry entries): per-payload feature extraction (1:1) JOINED
    with one-to-many frame sampling (the video frame-extraction
    shape), each through its own Arrow-batched mapInPandas pass.
    Output grain = sampled frame, carrying the payload-level features;
    both UDF paths are value-checked by the oracle on every row.

    Scale note: the join key is the payload id — frame rows join
    against the 1:1 feature rows co-partitioned by id; binary payloads
    themselves never shuffle (both mapInPandas passes are narrow)."""
    docs = with_binary_content(table(spark, sf_dir, "documents"))
    feats = binary_features(docs)
    frames = frame_samples(docs)
    return frames.join(feats, "id").select(
        "id", "modality", "n_bytes", "content_md5", "frame_idx", "frame_md5"
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone per-payload feature extraction (library form; the
    registered query is multimodal_features_frames)."""
    docs = table(spark, sf_dir, "documents")
    return binary_features(with_binary_content(docs))


def multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone frame sampling (library form; the registered query
    is multimodal_features_frames)."""
    docs = table(spark, sf_dir, "documents")
    return frame_samples(with_binary_content(docs))

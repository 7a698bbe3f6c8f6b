"""Streaming exact deduplication (SURVEY L1/L2 × L6).

Batch dedup (plans/dedup.py) answers "which documents in this corpus
are duplicates"; an ingestion pipeline needs the online form: drop a
document the moment it arrives if its content was already seen.  That
is ``dropDuplicatesWithinWatermark`` over a content hash:

- state is ONE hash row per kept document, partitioned by hash —
  O(docs in the watermark horizon), independent of document size,
  because only the 128-bit hash and the watermark timestamp live in
  the state store;
- the watermark bounds state for an unbounded stream: a hash is
  evicted once the watermark passes its arrival time, so the horizon
  is the dedup guarantee window (exact within it, best-effort after
  eviction).  Plain ``dropDuplicates`` on a stream would keep state
  forever and OOM at 100 TB/day;
- the hash is computed on the raw UTF-8 text (exact dedup); swap in
  the canonicalized text from plans/dedup.py for normalized dedup —
  the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_docs_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First arrival of each exact text wins; later copies within the
    watermark horizon are dropped.

    ``ts_col``: event-time column for the watermark; ``None`` stamps
    processing time (``current_timestamp``) — the common shape for an
    ingestion firehose where arrival order IS the dedup order."""
    hashed = docs.withColumn(
        "content_hash", F.md5(F.encode(F.col(text_col), "UTF-8"))
    )
    ts = F.col(ts_col) if ts_col else F.current_timestamp()
    return (
        hashed.withColumn("_arrival_ts", ts)
        .withWatermark("_arrival_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .drop("_arrival_ts")
    )

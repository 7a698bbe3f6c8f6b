"""Structured Streaming surface (SURVEY L6).

The reference has no streaming abstraction — its ``window()`` use is
batch time-bucketing (SequentialTopKRecommender.scala:314-319).  This
package provides the readStream twins of the batch event queries in
plans/relational.py: tumbling windows with watermarks and session
windows, file-source tested against the batch results.
"""

from .dedup import dedup_docs_stream
from .joins import purchase_view_join_stream
from .stateful import running_user_totals_stream
from .windows import (
    daily_counts_stream,
    histogram_sketch_stream,
    read_events_stream,
    run_stream_once,
    session_rows_stream,
    sliding_counts_stream,
)

__all__ = [
    "read_events_stream",
    "daily_counts_stream",
    "session_rows_stream",
    "sliding_counts_stream",
    "histogram_sketch_stream",
    "run_stream_once",
    "running_user_totals_stream",
    "dedup_docs_stream",
    "purchase_view_join_stream",
]

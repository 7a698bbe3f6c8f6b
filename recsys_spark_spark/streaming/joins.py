"""Stream-stream interval join (L6 family).

The windows/dedup/stateful modules cover single-stream operators; this
adds the two-stream shape: purchases enriched with the same user's
views from the preceding ``lookback`` — the classic attribution join.

Structured-Streaming mechanics: BOTH sides carry a watermark and the
join condition bounds the two event times against each other
(``v_ts ∈ [p_ts − lookback, p_ts]``), so Spark can compute a state
watermark per side and evict buffered rows once they can no longer
match any future input — state is O(events inside the watermark
horizon), hash-partitioned by the ``user_id`` equi-key, never
unbounded.  Late rows beyond the watermark are dropped, matching the
window operators' semantics.

Batch twin: ``plans/relational.py::events_purchase_view_join`` (same
expression over the batch reader, DuckDB-oracle-checked); parity is
asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_view_join_stream(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Each purchase joined to the same user's views in the preceding
    ``lookback``; returns ``(purchase_id, view_id, user_id, gap_s)``
    with ``gap_s`` = whole seconds from view to purchase (≥ 0).

    ``watermark`` must be ≥ the join lookback, or in-horizon matches
    would be evicted before their partner arrives.

    Works on a streaming OR batch ``events`` DataFrame — the batch twin
    registers the identical expression, so stream/batch parity is a
    property of the plan, not two implementations.
    """
    p = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    v = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    joined = p.join(
        v,
        F.expr(
            "user_id = v_user"
            f" AND v_ts >= p_ts - INTERVAL {lookback}"
            " AND v_ts <= p_ts"
        ),
    )
    # truncated-second diff: tz-independent, NTZ-safe, and the exact
    # expression DuckDB's date_diff('second', ...) replays (see
    # sources/readers.py ts notes)
    return joined.select(
        "purchase_id",
        "view_id",
        "user_id",
        F.timestamp_diff(
            "SECOND",
            F.date_trunc("second", "v_ts"),
            F.date_trunc("second", "p_ts"),
        ).alias("gap_s"),
    )

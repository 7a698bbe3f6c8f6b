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


def attribution_view_pairs_stream(
    events: DataFrame,
    lookback: str = "7 days",
    watermark: str = "8 days",
) -> DataFrame:
    """Streaming half of last-touch attribution (r11, the L6
    completion of the r10-born attribution family): every (purchase,
    same-user view within ``lookback``) pair from a stream-stream
    interval join.  Returns ``(purchase_id, p_ts, value, v_ts)``;
    the batch read-back max-collapses ``v_ts`` per purchase and
    LEFT-joins purchases to classify the rest as direct.

    Correctness of the lookback restriction: the as-of argmax over
    ALL views equals the argmax over in-lookback views exactly when
    the global argmax is in-lookback, and a purchase whose most
    recent view is older than ``lookback`` is classified direct
    either way — so the pair relation reproduces the batch
    attribution bit-for-bit after the collapse.

    Mode note (the reason the per-purchase max does NOT run
    stream-side here): stream-stream joins only run in APPEND mode,
    where a downstream windowed max would emit a window only once the
    watermark passes it — an availableNow drain-and-stop harness
    would lose the final horizon's purchases.  A continuous
    deployment CAN chain ``groupBy(window('p_ts','1 day'),
    purchase_id).agg(max(v_ts))`` after this join (Spark's
    multiple-stateful-operators support) because its watermark keeps
    advancing; the drain harness sinks the raw pairs instead and
    collapses in the read-back — same relation, duplicate-bounded
    store (≤ views-in-lookback rows per purchase).

    State: both sides bounded by the watermark horizon, hash-
    partitioned on the ``user_id`` equi-key — O(events in horizon),
    never unbounded.  ``watermark`` must be ≥ ``lookback`` or
    in-horizon matches would be evicted before their partner
    arrives."""
    p = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
            "value",
        )
        .withWatermark("p_ts", watermark)
    )
    v = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    return p.join(
        v,
        F.expr(
            "user_id = v_user"
            f" AND v_ts >= p_ts - INTERVAL {lookback}"
            " AND v_ts <= p_ts"
        ),
    ).select("purchase_id", "p_ts", "value", "v_ts")

"""Custom stateful streaming operator (SURVEY L6 /
`applyInPandasWithState`): a running per-user aggregate whose state
survives across micro-batches — the building block for streaming
sessionization, rate limiting, and online feature stores that
`groupBy().agg()` watermark semantics can't express.

State is one (count, sum) pair per user key, held in the state store
(checkpointed, partitioned by key) — independent of event volume, but
WITHOUT an idle timeout it is O(users EVER seen), not O(active users):
on a stream with key churn the store grows monotonically.  Pass
``idle_timeout_ms`` to evict keys idle longer than that (their totals
restart from zero if the key returns — the right trade for rate
limiting / feature freshness; keep the default for true
lifetime-running totals where every key stays live).

CAVEAT (observed on Spark 4.1): with ProcessingTimeTimeout a
``Trigger.AvailableNow`` query never terminates — after the data is
exhausted it loops "No new data but cleaning up state" batches
indefinitely.  The timeout variant is for continuously-running
streams; drive bounded runs with ``processAllAvailable()`` + ``stop()``
(as tests/test_stateful_streaming.py does), not availableNow.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def running_user_totals_stream(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running (event count, value sum), emitted once per
    key per micro-batch in update mode.  The pandas function receives
    each key's batch rows as Arrow frames plus its persisted
    GroupState.  ``idle_timeout_ms`` bounds the store to active keys
    (see module docstring for the eviction trade-off)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def totals(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout_ms is not None and state.hasTimedOut:
            # idle key: drop its state; nothing to emit this batch
            state.remove()
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        totals,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )

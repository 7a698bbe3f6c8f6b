"""Custom stateful streaming operator (SURVEY L6 /
`applyInPandasWithState`): a running per-user aggregate whose state
survives across micro-batches — the building block for streaming
sessionization, rate limiting, and online feature stores that
`groupBy().agg()` watermark semantics can't express.

State is one (count, sum) pair per user key, held in the state store
(checkpointed, partitioned by key) — at 100 TB/day the state size is
O(|active users|), independent of event volume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running (event count, value sum), emitted once per
    key per micro-batch in update mode.  The pandas function receives
    each key's batch rows as Arrow frames plus its persisted
    GroupState."""

    def totals(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        totals,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

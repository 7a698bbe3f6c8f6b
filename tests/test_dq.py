"""events_dq_audit: the violation counters must actually fire —
the registered query's zeros on the clean corpus are meaningful only
if injected dirty rows are counted (oracle parity is covered by
tests/test_oracle_parity.py)."""

from __future__ import annotations

import datetime

from recsys_spark_spark.plans.relational import dq_audit


def test_dq_audit_counts_injected_violations(spark):
    ts = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # clean rows
        (1, ts, 10, "view", 1.0, "{}"),
        (2, ts + datetime.timedelta(hours=1), 11, "click", 2.0, "{}"),
        # duplicate event_id
        (2, ts, 12, "view", 1.0, "{}"),
        # unknown type + negative value + malformed props
        (3, ts, 10, "teleport", -5.0, "not-json"),
        # nulls everywhere nullable
        (4, None, None, None, None, None),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    )
    got = dq_audit(e).collect()[0].asDict()
    assert got["n_rows"] == 5
    assert got["n_event_ids"] == 4
    assert got["dup_event_ids"] == 1
    assert got["n_users"] == 3
    assert got["null_ts"] == 1
    assert got["null_user"] == 1
    assert got["null_type"] == 1
    assert got["null_value"] == 1
    assert got["null_props"] == 1
    assert got["unknown_type"] == 1
    assert got["negative_value"] == 1
    assert got["malformed_props"] == 1
    assert got["min_ts"] == ts
    assert got["max_ts"] == ts + datetime.timedelta(hours=1)

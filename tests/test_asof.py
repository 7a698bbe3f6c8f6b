"""asof_join edge semantics (operators/asof.py): per-side default
ordering, NULL-value right rows, and at-or-before tie rules."""

from __future__ import annotations

import datetime as dt

from recsys_spark_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_asof_differing_ts_names_without_tiebreak(spark):
    """Regression: the default ordering must resolve each side's OWN
    ts column — left_ts used to be (wrongly) selected on the right."""
    trades = spark.createDataFrame(
        [(1, _ts(5))], "sym long, trade_ts timestamp"
    )
    quotes = spark.createDataFrame(
        [(1, _ts(1), 10.0), (1, _ts(3), 11.0), (1, _ts(9), 12.0)],
        "sym long, quote_ts timestamp, bid double",
    )
    out = asof_join(
        trades, quotes, by="sym", value_col="bid",
        left_ts="trade_ts", right_ts="quote_ts",
    ).collect()
    assert len(out) == 1 and out[0]["asof_bid"] == 11.0


def test_asof_null_right_value_is_served_not_stale(spark):
    """A NULL value in the latest right record is a real observation —
    the join must serve it, not the older non-NULL value."""
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(1), 10.0), (1, _ts(2), None)],
        "k long, ts timestamp, v double",
    )
    out = asof_join(left, right, by="k", value_col="v").collect()
    assert len(out) == 1 and out[0]["asof_v"] is None


def test_asof_no_prior_right_row_is_null(spark):
    left = spark.createDataFrame([(1, _ts(0))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), 1.0)], "k long, ts timestamp, v double"
    )
    out = asof_join(left, right, by="k", value_col="v").collect()
    assert out[0]["asof_v"] is None


def test_pagerank_sink_nodes_get_rank_rows(spark):
    """Regression: a node appearing only as dst (pure sink) must get a
    rank row and receive its incoming mass."""
    from recsys_spark_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1.0)], "src string, dst string, w double"
    )
    out = {r["id"]: r["pr"] for r in pagerank(edges, iters=3).collect()}
    assert set(out) == {"a", "b"}
    assert out["b"] > out["a"]  # b receives a's mass on top of (1-d)/n

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


# --- bounded-task chunked twin (r11) ----------------------------------------


def _chunked(left, right, **kw):
    from recsys_spark_spark.operators.asof import asof_join_chunked

    return asof_join_chunked(left, right, **kw)


def test_asof_chunked_carry_from_previous_chunk(spark):
    """The right row lives in an EARLIER chunk than the left row —
    only the cross-chunk carry (previous chunk's last right struct)
    can serve it."""
    left = spark.createDataFrame(
        [(1, _ts(100))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(1), 7.0), (1, _ts(3), 8.0)],
        "k long, ts timestamp, v double",
    )
    out = _chunked(left, right, by="k", value_col="v", chunk_s=10).collect()
    assert len(out) == 1 and out[0]["asof_v"] == 8.0


def test_asof_chunked_hole_chunks_propagate(spark):
    """Chunks with no rows at all between the right row and the left
    row: the ignorenulls prefix over PRESENT chunks must carry the
    struct across the hole."""
    left = spark.createDataFrame([(1, _ts(1000))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(0), 5.0)], "k long, ts timestamp, v double"
    )
    # chunk_s=10: right in chunk 0, left in chunk 100, 99 hole chunks
    out = _chunked(left, right, by="k", value_col="v", chunk_s=10).collect()
    assert out[0]["asof_v"] == 5.0


def test_asof_chunked_left_only_chunk_between(spark):
    """A PRESENT chunk holding only left rows must not reset the
    carry (its per-chunk last-right summary is NULL — ignorenulls
    skips it)."""
    left = spark.createDataFrame(
        [(1, _ts(15)), (1, _ts(25))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 3.0)], "k long, ts timestamp, v double"
    )
    got = {
        r["ts"]: r["asof_v"]
        for r in _chunked(left, right, by="k", value_col="v", chunk_s=10).collect()
    }
    assert got == {_ts(15): 3.0, _ts(25): 3.0}


def test_asof_chunked_exact_ts_tie_at_boundary(spark):
    """A right row at EXACTLY the left row's ts shares its chunk by
    construction (same epoch second → same chunk), so the at-or-before
    tie rule applies in-chunk — including when that ts IS a chunk
    boundary."""
    boundary = _ts(20)  # epoch multiple of chunk_s=10 offset irrelevant
    left = spark.createDataFrame([(1, boundary)], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(19), 1.0), (1, boundary, 2.0)],
        "k long, ts timestamp, v double",
    )
    out = _chunked(left, right, by="k", value_col="v", chunk_s=10).collect()
    assert out[0]["asof_v"] == 2.0


def test_asof_chunked_null_right_value_carried(spark):
    """The struct-wrapped carry preserves genuine-NULL semantics
    ACROSS chunks: the newest right record's NULL must be served, not
    the older chunk's non-NULL value."""
    left = spark.createDataFrame([(1, _ts(100))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(1), 10.0), (1, _ts(12), None)],
        "k long, ts timestamp, v double",
    )
    out = _chunked(left, right, by="k", value_col="v", chunk_s=10).collect()
    assert len(out) == 1 and out[0]["asof_v"] is None


def test_asof_chunked_equals_plain_on_dense_history(spark):
    """Bit-equality with the plain operator over a dense multi-key
    synthetic history crossing many chunk boundaries."""
    import itertools

    rows_l, rows_r = [], []
    for k, i in itertools.product(range(3), range(40)):
        rows_l.append((k, _ts(7 * i + k)))
        if i % 3 != 2:
            rows_r.append((k, _ts(5 * i + 2 * k), float(100 * k + i)))
    left = spark.createDataFrame(rows_l, "k long, ts timestamp")
    right = spark.createDataFrame(rows_r, "k long, ts timestamp, v double")
    plain = {
        (r["k"], r["ts"]): r["asof_v"]
        for r in asof_join(left, right, by="k", value_col="v").collect()
    }
    chunked = {
        (r["k"], r["ts"]): r["asof_v"]
        for r in _chunked(left, right, by="k", value_col="v", chunk_s=30).collect()
    }
    assert plain == chunked


def test_asof_chunked_check_unique_raises_on_ambiguous_duplicates(spark):
    """r12 VERDICT #5: duplicate (key, ts, tiebreak) right rows with
    DIFFERENT values make the twin order ambiguous — strict mode must
    fail loudly instead of silently diverging from the plain form."""
    import pytest

    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), 10.0), (1, _ts(5), 11.0)],
        "k long, ts timestamp, v double",
    )
    with pytest.raises(ValueError, match="distinct 'v' values"):
        _chunked(left, right, by="k", value_col="v", check_unique=True)


def test_asof_chunked_check_unique_allows_same_value_duplicates(spark):
    """Same-value duplicates are harmless (any order serves the same
    answer) — strict mode must NOT reject them."""
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), 10.0), (1, _ts(5), 10.0), (1, _ts(7), 12.0)],
        "k long, ts timestamp, v double",
    )
    out = _chunked(
        left, right, by="k", value_col="v", check_unique=True
    ).collect()
    assert len(out) == 1 and out[0]["asof_v"] == 12.0

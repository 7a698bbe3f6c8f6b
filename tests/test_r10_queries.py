"""Planted-fixture tests for the r10-born queries (hard-negative
mining, time-RANGE rolling revenue, last-touch attribution).  Oracle
parity at sf0.01 rides tests/test_oracle_parity.py; here the boundary
semantics are pinned on hand-computable inputs."""

from datetime import datetime

from pyspark.sql import functions as F

from recsys_spark_spark.plans.ann import hard_negatives
from recsys_spark_spark.plans.windows_extra import (
    last_touch_attribution,
    rolling_span_revenue,
)


# --- hard negatives ---------------------------------------------------------


def test_hard_negatives_excludes_same_label(spark):
    """The nearest vector overall shares the query's label and must
    NOT appear; ranking runs over the different-label set only."""
    rows = [
        (0, [1.0, 0.0], 0),  # the query
        (1, [0.999, 0.01], 0),  # nearest overall — same label, excluded
        (2, [0.9, 0.436], 1),  # top hard negative
        (3, [0.0, 1.0], 2),  # orthogonal
        (4, [-1.0, 0.0], 1),  # opposite
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = hard_negatives(e, n_queries=1, k=2).collect()
    assert [(r["match_id"], r["rank"]) for r in out] == [(2, 1), (3, 2)]
    assert all(r["query_label"] == 0 and r["match_label"] != 0 for r in out)
    assert out[0]["sim"] > 0.89 and abs(out[1]["sim"]) < 1e-9


def test_hard_negatives_rank_ties_break_by_id(spark):
    """Equal-similarity negatives order by ascending match_id (the
    same deterministic tiebreak as the KNN family)."""
    rows = [
        (0, [1.0, 0.0], 0),
        (5, [0.0, 1.0], 1),  # sim 0.0
        (3, [0.0, -1.0], 1),  # sim 0.0 — lower id wins rank 1
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = hard_negatives(e, n_queries=1, k=2).collect()
    assert [(r["match_id"], r["rank"]) for r in out] == [(3, 1), (5, 2)]


# --- time-RANGE rolling revenue ----------------------------------------------


def _orders(spark, rows):
    return spark.createDataFrame(
        [(ok, ck, float(p), datetime(2024, 1, d)) for ok, ck, p, d in rows],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp_ntz",
    )


def test_rolling_span_boundary_inclusive(spark):
    """An order exactly 7 days earlier is INSIDE the trailing frame;
    7 days + 1 day is outside."""
    o = _orders(
        spark,
        [
            (1, 100, 10.00, 1),  # day 1
            (2, 100, 20.00, 8),  # day 8 = exactly 7 days after day 1 → includes o1
            (3, 100, 30.00, 9),  # day 9: o1 is 8 days back → excluded
            (4, 100, 5.50, 21),  # isolated
        ],
    )
    got = {
        r["orderkey"]: (r["revenue_7d"], r["n_orders_7d"])
        for r in rolling_span_revenue(o, 7 * 86400).collect()
    }
    assert got == {
        1: (10.00, 1),
        2: (30.00, 2),
        3: (50.00, 2),
        4: (5.50, 1),
    }


def test_rolling_span_same_day_peers_share_frame(spark):
    """RANGE frames are peer-inclusive: two same-day orders each see
    BOTH totals (not a running split by arrival order)."""
    o = _orders(spark, [(1, 7, 1.25, 5), (2, 7, 2.50, 5)])
    got = {
        r["orderkey"]: (r["revenue_7d"], r["n_orders_7d"])
        for r in rolling_span_revenue(o, 7 * 86400).collect()
    }
    assert got == {1: (3.75, 2), 2: (3.75, 2)}


def test_rolling_span_partitions_do_not_leak(spark):
    """Same-day orders of DIFFERENT customers never share a frame."""
    o = _orders(spark, [(1, 7, 1.00, 5), (2, 8, 2.00, 5)])
    got = {
        r["orderkey"]: (r["revenue_7d"], r["n_orders_7d"])
        for r in rolling_span_revenue(o, 7 * 86400).collect()
    }
    assert got == {1: (1.00, 1), 2: (2.00, 1)}


# --- last-touch attribution ---------------------------------------------------

_EV_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double"
)


def _events(spark, rows):
    return spark.createDataFrame(rows, _EV_SCHEMA)


def test_attribution_daily_rollup(spark):
    """Four hand-computed purchases: in-window view (attributed),
    view at the exact purchase timestamp (attributed, gap 0),
    no view at all (direct), view older than the 7-day lookback
    (direct, lands on its own day)."""
    t = lambda *a: datetime(*a)  # noqa: E731
    e = _events(
        spark,
        [
            # u1: view 10 s before the purchase
            (1, t(2024, 1, 1, 0, 0, 0), 1, "view", 0.0),
            (2, t(2024, 1, 1, 0, 0, 10), 1, "purchase", 5.0),
            # u2: view 8 days before the purchase → outside lookback
            (3, t(2024, 1, 1, 0, 0, 0), 2, "view", 0.0),
            (4, t(2024, 1, 9, 0, 0, 0), 2, "purchase", 7.0),
            # u3: purchase with no view at all
            (5, t(2024, 1, 1, 0, 0, 30), 3, "purchase", 3.0),
            # u4: view at exactly the purchase ts → at-or-before, gap 0
            (6, t(2024, 1, 1, 0, 1, 0), 4, "view", 0.0),
            (7, t(2024, 1, 1, 0, 1, 0), 4, "purchase", 2.0),
        ],
    )
    out = {
        r["day"]: r
        for r in last_touch_attribution(e, 7 * 86400 * 1_000_000).collect()
    }
    d1 = out[t(2024, 1, 1)]
    assert (d1["n_purchases"], d1["n_attributed"]) == (3, 2)
    assert (d1["attributed_value"], d1["direct_value"]) == (7.0, 3.0)
    assert d1["avg_gap_s"] == 5.0  # (10 + 0) / 2
    d9 = out[t(2024, 1, 9)]
    assert (d9["n_purchases"], d9["n_attributed"]) == (1, 0)
    assert (d9["attributed_value"], d9["direct_value"]) == (0.0, 7.0)
    assert d9["avg_gap_s"] is None


def test_attribution_last_view_wins_not_first(spark):
    """Two prior views: the gap is measured from the LATEST one."""
    t = lambda *a: datetime(*a)  # noqa: E731
    e = _events(
        spark,
        [
            (1, t(2024, 1, 1, 0, 0, 0), 1, "view", 0.0),
            (2, t(2024, 1, 1, 0, 0, 40), 1, "view", 0.0),
            (3, t(2024, 1, 1, 0, 1, 0), 1, "purchase", 4.0),
        ],
    )
    row = last_touch_attribution(e, 7 * 86400 * 1_000_000).collect()[0]
    assert row["avg_gap_s"] == 20.0
    assert (row["n_attributed"], row["attributed_value"]) == (1, 4.0)


# --- ghost-replica rolling twin ----------------------------------------------

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from recsys_spark_spark.plans.windows_extra import (
    rolling_span_revenue_chunked,
)


def test_rolling_chunked_rejects_narrow_chunks(spark):
    o = _orders(spark, [(1, 1, 1.0, 1)])
    with pytest.raises(ValueError):
        rolling_span_revenue_chunked(o, span_s=7 * 86400, chunk_s=86400)


def _both_forms(spark, rows, span_s, chunk_s):
    from recsys_spark_spark.plans.windows_extra import rolling_span_revenue

    o = _orders(spark, rows)
    plain = {
        r["orderkey"]: (r["revenue_7d"], r["n_orders_7d"])
        for r in rolling_span_revenue(o, span_s).collect()
    }
    chunked = {
        r["orderkey"]: (r["revenue_7d"], r["n_orders_7d"])
        for r in rolling_span_revenue_chunked(o, span_s, chunk_s).collect()
    }
    return plain, chunked


def test_rolling_chunked_ghost_boundary_exact(spark):
    """chunk_s == span: the MAXIMAL-ghosting regime — every row sits
    within span of its chunk end, so every row replicates (the ghost
    predicate is vacuously true) and the test certifies the
    replicate-and-drop plumbing end-to-end across straddling frames.
    (January days here are NOT chunk-aligned — 2024 epochs are not
    week-multiples — which is fine for this regime; the exact
    `>= next_chunk_start - span` boundary needs chunk_s > span and is
    pinned by test_rolling_chunked_ghost_predicate_boundary below.)"""
    span = 7 * 86400
    rows = [
        (1, 5, 10.0, 1),
        (2, 5, 20.0, 7),
        (3, 5, 30.0, 8),
        (4, 5, 40.0, 14),
        (5, 5, 50.0, 15),
    ]
    plain, chunked = _both_forms(spark, rows, span, span)
    assert plain == chunked


def test_rolling_chunked_ghost_predicate_boundary(spark):
    """THE ghost-predicate boundary (r10 ADVICE): with chunk_s =
    2*span a row at EXACTLY next_chunk_start - span is the oldest row
    the `>=` predicate still replicates — derive the timestamps from
    real epoch arithmetic so that row exists, then verify a frame in
    the next chunk that reaches exactly back to it.  A `>` predicate
    (off-by-boundary) would drop the ghost and diverge from the plain
    form."""
    from datetime import datetime, timezone

    from recsys_spark_spark.plans.windows_extra import (
        rolling_span_revenue,
    )

    span = 7 * 86400
    chunk_s = 2 * span
    # the chunk grid is epoch // chunk_s: pick the chunk containing
    # Jan 2024 and place the boundary row at next_start - span
    some_jan = int(datetime(2024, 1, 10, tzinfo=timezone.utc).timestamp())
    next_start = (some_jan // chunk_s + 1) * chunk_s
    boundary = next_start - span  # oldest epoch the >= predicate ghosts
    rows = [
        (1, 5, 10.0, boundary),
        (2, 5, 20.0, boundary + span),  # frame reaches EXACTLY back
        (3, 5, 30.0, boundary + span + 1),  # frame excludes the ghost
    ]
    o = spark.createDataFrame(
        [
            (ok, ck, p, datetime.fromtimestamp(e, tz=timezone.utc).replace(tzinfo=None))
            for ok, ck, p, e in rows
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp_ntz",
    )
    plain = {
        r["orderkey"]: (r["revenue_7d"], r["n_orders_7d"])
        for r in rolling_span_revenue(o, span).collect()
    }
    chunked = {
        r["orderkey"]: (r["revenue_7d"], r["n_orders_7d"])
        for r in rolling_span_revenue_chunked(o, span, chunk_s).collect()
    }
    # rows 1/2 are in DIFFERENT chunks and exactly span apart
    assert boundary // chunk_s + 1 == (boundary + span) // chunk_s
    assert plain[2] == (30.0, 2)  # the ghost is inside row 2's frame
    assert plain[3] == (50.0, 2)  # row 1 aged out, rows 2+3 remain
    assert plain == chunked


def test_rolling_chunked_matches_plain_on_sf0001(spark, sf_dir):
    """Bit-equality of the two forms on the real table at smoke scale
    (both also hash-match the shared DuckDB oracle at sf0.01 via
    test_oracle_parity)."""
    from recsys_spark_spark.plans.windows_extra import (
        orders_rolling_7d_revenue,
        orders_rolling_7d_revenue_chunked,
    )

    small = "/root/testdata/sf0.001"
    a = orders_rolling_7d_revenue(spark, small)
    b = orders_rolling_7d_revenue_chunked(spark, small)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@settings(
    derandomize=True,
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    days=st.lists(
        st.tuples(st.integers(1, 27), st.integers(1, 3), st.integers(0, 999)),
        min_size=1,
        max_size=25,
    ),
    span_days=st.integers(1, 9),
)
def test_rolling_chunked_property_vs_python(spark, days, span_days):
    """Chunked twin vs a pure-python trailing-window reference, chunk
    width == span (the most-ghosts regime), random same-day ties."""
    from datetime import datetime

    span = span_days * 86400
    rows = [
        (i + 1, cust, cents / 100.0, day)
        for i, (day, cust, cents) in enumerate(days)
    ]
    o = _orders(spark, rows)
    got = {
        r["orderkey"]: (r["revenue_7d"], r["n_orders_7d"])
        for r in rolling_span_revenue_chunked(o, span, span).collect()
    }
    # python reference: peer-inclusive trailing [ts-span, ts] per cust
    import collections

    by_cust = collections.defaultdict(list)
    for ok, cust, price, day in rows:
        by_cust[cust].append((day * 86400, ok, price))
    want = {}
    for cust, rs in by_cust.items():
        for ts, ok, _ in rs:
            inwin = [p for (t2, _, p) in rs if ts - span <= t2 <= ts]
            want[ok] = (round(sum(int(round(p * 100)) for p in inwin) / 100.0, 2),
                        len(inwin))
    assert got == want

"""Property tests for the bounded-task window-twin family (r9):
events_sessions_chunked and chunked_running_sum must equal their
sequential forms on RANDOM timelines at RANDOM chunk granularities —
the boundary cases (ties at chunk edges, sessions spanning many
chunks, empty chunks) are exactly where a two-phase composition
breaks, and a fixed fixture only pins the boundaries someone thought
of."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

SETTINGS = settings(
    derandomize=True,  # driver-gate convention (test_similarity_props)
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (user, offset-seconds) event lists: offsets cluster near multiples
# of the chunk width so ties and boundary-straddles are common
timelines = st.lists(
    st.tuples(
        st.integers(1, 4),  # user
        st.integers(0, 40),  # coarse slot
        st.integers(-2, 2),  # jitter around the slot edge
    ),
    min_size=1,
    max_size=60,
)


def _sessions_plain(rows, gap):
    out = {}
    by_user = {}
    for eid, (u, ts) in enumerate(rows):
        by_user.setdefault(u, []).append((ts, eid))
    for u, evs in by_user.items():
        evs.sort()
        n = 0
        prev = None
        for ts, _ in evs:
            if prev is None or ts - prev > gap:
                n += 1
            prev = ts
        out[u] = (n, len(evs))
    return out


@given(tl=timelines, chunk_s=st.sampled_from([7, 13, 50]))
@SETTINGS
def test_sessions_chunked_equals_python_reference(spark, tl, chunk_s):
    """Chunked sessionization == a sequential pure-python reference on
    random timelines, for chunk widths both below and above the 30 s
    session gap (a chunk narrower than the gap forces MOST session
    merges across boundaries — the hardest regime)."""
    from recsys_spark_spark.plans.relational import events_sessions_chunked

    rows = [(u, max(0, slot * 10 + j)) for u, slot, j in tl]
    events = [(eid, u, ts) for eid, (u, ts) in enumerate(rows)]
    # the public function hard-pins the 1800 s production gap, so
    # scale the synthetic offsets by 60: a 30 s reference gap becomes
    # 1800 s, and the chunk width scales with it
    import tempfile

    scaled = [(eid, u, ts * 60) for eid, u, ts in events]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            scaled, "event_id long, user_id long, off long"
        ).select(
            "event_id",
            "user_id",
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(secs=F.col("off").cast("double"))
            ).alias("ts"),
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in events_sessions_chunked(
                spark, d, chunk_s=chunk_s * 60
            ).collect()
        }
    want = _sessions_plain(
        [(u, ts * 60) for u, _, ts in [(e[1], e[0], e[2]) for e in events]],
        1800,
    )
    assert got == want


@given(
    tl=st.lists(
        st.tuples(
            st.integers(1, 3),  # part
            st.integers(0, 30),  # order key
            st.integers(-500, 500),  # value in cents
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda t: (t[0], t[1]),
    ),
    chunk_w=st.sampled_from([3, 7, 100]),
)
@SETTINGS
def test_chunked_running_sum_equals_sequential(spark, tl, chunk_w):
    """The generic two-phase prefix sum == the sequential window on
    random exact-decimal values at random chunk widths (including one
    wider than every key range — the single-chunk degenerate case)."""
    from recsys_spark_spark.plans.windows_extra import chunked_running_sum

    t = spark.createDataFrame(
        [(p, o, v) for p, o, v in tl], "p long, o long, cents long"
    ).select("p", "o", (F.col("cents").cast("decimal(18,0)")).alias("v"))
    seq = t.select(
        "p",
        "o",
        F.round(
            F.sum("v").over(
                Window.partitionBy("p")
                .orderBy("o")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        )
        .cast("double")
        .alias("rs"),
    )
    par = chunked_running_sum(
        t, "p", ["o"], "v", F.floor(F.col("o") / chunk_w), "rs", 2
    )
    key = ["p", "o"]
    a = {(r["p"], r["o"]): r["rs"] for r in seq.collect()}
    b = {(r["p"], r["o"]): r["rs"] for r in par.collect()}
    assert a == b


@given(tl=timelines, chunk_s=st.sampled_from([7, 13, 50]))
@SETTINGS
def test_prev_gap_chunked_equals_python_reference(spark, tl, chunk_s):
    """Chunked lag == a sequential pure-python reference on random
    timelines (ties included via the jitter strategy), at chunk widths
    small enough that most gaps cross a boundary."""
    import tempfile

    from recsys_spark_spark.plans.relational import events_prev_gap_chunked

    rows = [(eid, u, max(0, slot * 10 + j)) for eid, (u, slot, j) in enumerate(tl)]
    # pure-python reference: sort by (ts, event_id) per user, diff
    want = {}
    by_user = {}
    for eid, u, ts in rows:
        by_user.setdefault(u, []).append((ts, eid))
    for u, evs in by_user.items():
        evs.sort()
        prev = None
        for ts, eid in evs:
            want[eid] = None if prev is None else ts - prev
            prev = ts
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id long, user_id long, off long"
        ).select(
            "event_id",
            "user_id",
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(secs=F.col("off").cast("double"))
            ).alias("ts"),
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r["event_id"]: r["gap_s"]
            for r in events_prev_gap_chunked(spark, d, chunk_s=chunk_s).collect()
        }
    assert got == want


# --- as-of twin (r11, fifth carry class) ------------------------------------


def _asof_python(left_rows, right_rows):
    """Sequential reference: for each left (k, ts, id), the value of
    the right row with max (ts, id) among right.ts <= left.ts."""
    out = {}
    by_k = {}
    for k, ts, rid, v in right_rows:
        by_k.setdefault(k, []).append((ts, rid, v))
    for k in by_k:
        by_k[k].sort()
    for k, ts, lid in left_rows:
        best = None
        for rts, rid, v in by_k.get(k, []):
            if rts <= ts:
                best = v
            else:
                break
        out[(k, ts, lid)] = best
    return out


asof_lists = st.lists(
    st.tuples(
        st.integers(1, 3),  # key
        st.integers(0, 35),  # slot
        st.integers(-1, 1),  # jitter around chunk edges
    ),
    min_size=1,
    max_size=40,
)


@given(ls=asof_lists, rs=asof_lists, chunk_s=st.sampled_from([7, 13, 50]))
@SETTINGS
def test_asof_chunked_equals_python_reference(spark, ls, rs, chunk_s):
    """asof_join_chunked == a sequential pure-python as-of on random
    left/right timelines at random chunk widths — boundary ties,
    right-only and left-only chunks, hole chunks all arise here.
    Unique per-side ids make the per-key order (and therefore the
    carried struct) deterministic."""
    import datetime as dt

    from recsys_spark_spark.operators.asof import asof_join_chunked

    t0 = dt.datetime(2024, 1, 1)
    lrows = [
        (k, t0 + dt.timedelta(seconds=s * chunk_s + j), i)
        for i, (k, s, j) in enumerate(ls)
    ]
    rrows = [
        (k, t0 + dt.timedelta(seconds=s * chunk_s + j), 1000 + i, float(i))
        for i, (k, s, j) in enumerate(rs)
    ]
    left = spark.createDataFrame(lrows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        rrows, "k long, ts timestamp, rid long, v double"
    )
    got = {
        (r["k"], r["ts"], r["lid"]): r["asof_v"]
        for r in asof_join_chunked(
            left, right, by="k", value_col="v", chunk_s=chunk_s
        ).collect()
    }
    want = _asof_python(
        [(k, ts, i) for k, ts, i in lrows],
        [(k, ts, rid, v) for k, ts, rid, v in rrows],
    )
    want = {
        (k, ts, i): v for (k, ts, i), v in want.items()
    }
    assert got == want


# --- KMV bottom-k (r11) -----------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1 << 60)),
        min_size=1,
        max_size=80,
    ),
    k=st.sampled_from([1, 3, 8]),
    parts=st.sampled_from([1, 5]),
)
@SETTINGS
def test_kmv_bottom_k_equals_python_reference(spark, rows, k, parts):
    """kmv_bottom_k == sorted(set(hashes))[:k] per group on random
    inputs at random partitionings (the partial's per-partition state
    merge is where duplicates across partitions could double-count)."""
    from recsys_spark_spark.operators.sketches import kmv_bottom_k

    rel = spark.createDataFrame(
        [(f"g{g}", h) for g, h in rows], "g string, _h long"
    ).repartition(parts)
    got = {}
    for r in kmv_bottom_k(rel, ["g"], k).collect():
        got.setdefault(r["g"], []).append(r["_h"])
    for g in got:
        got[g].sort()
    want = {}
    for g, h in rows:
        want.setdefault(f"g{g}", set()).add(h)
    want = {g: sorted(v)[:k] for g, v in want.items()}
    assert got == want

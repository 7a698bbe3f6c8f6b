"""Planted-fixture tests for the round-4 analytics additions:
Markov transition matrix, trailing-baseline daily anomalies,
market-basket co-occurrence lift, and unigram-LM log-prob scoring.
(Oracle parity for the registered forms runs in test_oracle_parity.)
"""

from __future__ import annotations

import datetime as dt
import math

from recsys_spark_spark.plans.llm import unigram_logprob
from recsys_spark_spark.plans.market import cooccurrence_lift
from recsys_spark_spark.plans.windows_extra import (
    daily_anomalies,
    transition_matrix,
)

TS0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (event_id, ts, user_id, event_type)"""
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_transition_matrix_counts_and_probs(spark):
    sec = dt.timedelta(seconds=1)
    rows = [
        # user 1: a -> b -> b -> c
        (1, TS0, 1, "a"),
        (2, TS0 + sec, 1, "b"),
        (3, TS0 + 2 * sec, 1, "b"),
        (4, TS0 + 3 * sec, 1, "c"),
        # user 2: a -> c   (no cross-user transition with user 1)
        (5, TS0, 2, "a"),
        (6, TS0 + sec, 2, "c"),
        # user 3: single event -> contributes nothing
        (7, TS0, 3, "a"),
    ]
    out = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in transition_matrix(_events(spark, rows)).collect()
    }
    assert out == {
        ("a", "b"): (1, 0.5),
        ("a", "c"): (1, 0.5),
        ("b", "b"): (1, 0.5),
        ("b", "c"): (1, 0.5),
    }


def test_transition_matrix_tie_breaks_by_event_id(spark):
    # two events at the IDENTICAL timestamp: order = event_id
    rows = [
        (10, TS0, 1, "x"),
        (11, TS0, 1, "y"),
        (12, TS0 + dt.timedelta(seconds=1), 1, "z"),
    ]
    out = {
        (r["from_type"], r["to_type"])
        for r in transition_matrix(_events(spark, rows)).collect()
    }
    assert out == {("x", "y"), ("y", "z")}


def test_daily_anomalies_flags_spike_not_baseline(spark):
    rows = []
    eid = 0
    # 8 baseline days alternating 10/12 events, then a 100-event spike
    for day in range(8):
        n = 10 if day % 2 == 0 else 12
        for _ in range(n):
            rows.append(
                (eid, TS0 + dt.timedelta(days=day), 1, "click")
            )
            eid += 1
    for _ in range(100):
        rows.append((eid, TS0 + dt.timedelta(days=8), 1, "click"))
        eid += 1
    out = {r["day"]: r for r in daily_anomalies(_events(spark, rows)).collect()}
    assert len(out) == 9
    spike = out["2024-01-09"]
    assert spike["is_anomaly"] is True
    assert spike["zscore"] > 3.0
    assert spike["n_hist"] == 7  # frame is capped at 7 prior days
    # warm-up rows (< 3 prior observations) carry NULL stats, no flag
    assert out["2024-01-01"]["mean_7d"] is None
    assert out["2024-01-01"]["is_anomaly"] is False
    assert out["2024-01-04"]["mean_7d"] is not None  # 3rd prior obs
    # baseline days never flag
    assert not any(
        out[d]["is_anomaly"] for d in out if d != "2024-01-09"
    )


def test_daily_anomalies_zero_variance_never_flags(spark):
    rows = []
    eid = 0
    for day in range(5):
        for _ in range(10):  # perfectly flat -> sd == 0
            rows.append((eid, TS0 + dt.timedelta(days=day), 1, "view"))
            eid += 1
    out = daily_anomalies(_events(spark, rows)).collect()
    assert all(r["zscore"] is None for r in out)
    assert not any(r["is_anomaly"] for r in out)


def _baskets(spark, baskets):
    rows = [
        (bid, item) for bid, items in baskets.items() for item in items
    ]
    return spark.createDataFrame(rows, "basket_id long, item_id long")


def test_cooccurrence_lift_hand_computed(spark):
    baskets = {1: [1, 2], 2: [1, 2], 3: [1, 3], 4: [2, 3], 5: [4]}
    out = cooccurrence_lift(_baskets(spark, baskets)).collect()
    # only (1,2) reaches min_support=2; lift = 2*5 / (3*3)
    assert len(out) == 1
    r = out[0]
    assert (r["part_a"], r["part_b"], r["nab"]) == (1, 2, 2)
    assert r["lift"] == round(10 / 9, 6)


def test_cooccurrence_lift_max_basket_cap_excludes_megabasket(spark):
    baskets = {
        1: [1, 2],
        2: [1, 2],
        3: [1, 2, 3, 4, 5],  # above the cap: dropped entirely
    }
    out = cooccurrence_lift(_baskets(spark, baskets), max_basket=4).collect()
    assert len(out) == 1
    r = out[0]
    # n_baskets = 2 (megabasket excluded), c1 = c2 = 2, nab = 2
    assert (r["part_a"], r["part_b"], r["nab"], r["lift"]) == (1, 2, 2, 1.0)


def test_cooccurrence_lift_dedupes_repeated_lines(spark):
    # the same item twice in one basket counts once (DISTINCT)
    baskets = {1: [1, 1, 2], 2: [2, 1]}
    out = cooccurrence_lift(_baskets(spark, baskets)).collect()
    assert len(out) == 1
    assert out[0]["nab"] == 2
    assert out[0]["lift"] == 1.0  # 2·2 / (2·2) over 2 baskets


def test_unigram_logprob_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    # vocab: a:2 b:2 c:1, T=5
    lp_a = math.log(2 / 5)
    lp_c = math.log(1 / 5)
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["mean_logprob"] - lp_a) < 2e-6
    expected2 = math.floor((lp_a + lp_c) / 2 * 1e6 + 0.5) / 1e6
    assert out[2]["n_tokens"] == 2
    assert abs(out[2]["mean_logprob"] - expected2) < 2e-6


def test_bigram_logprob_hand_computed(spark):
    from recsys_spark_spark.plans.llm import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "x")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    # bigrams: (a,a):1 (a,b):1 (b,c):1; ctx: a:2 b:1; V = |{a,b,c,x}| = 4
    lp_aa = math.log((1 + 1) / (2 + 4))
    lp_ab = math.log((1 + 1) / (2 + 4))
    lp_bc = math.log((1 + 1) / (1 + 4))
    assert out[1]["n_bigrams"] == 2
    exp1 = math.floor((lp_aa + lp_ab) / 2 * 1e6 + 0.5) / 1e6
    assert abs(out[1]["mean_logprob"] - exp1) < 2e-6
    assert out[2]["n_bigrams"] == 1
    assert abs(out[2]["mean_logprob"] - math.floor(lp_bc * 1e6 + 0.5) / 1e6) < 2e-6
    # single-token doc has no bigrams and drops out entirely
    assert 3 not in out


# --- negative sampling ------------------------------------------------------

def test_negative_samples_exclude_positives_and_cap(spark):
    from recsys_spark_spark.plans.recsys import negative_samples

    # user 1 rated items 0..4; catalog 0..99
    rows = [(1, i, 5.0) for i in range(5)] + [(2, i, 3.0) for i in range(3)]
    # make the full catalog visible through ratings of a third user
    rows += [(3, i, 1.0) for i in range(100)]
    r = spark.createDataFrame(rows, "user_id long, item_id long, rating double")
    out = negative_samples(r, pool_size=100, per_user=7).collect()
    by_user = {}
    for row in out:
        by_user.setdefault(row["user_id"], set()).add(row["item_id"])
    # positives never appear as negatives
    assert by_user[1].isdisjoint(set(range(5)))
    assert by_user[2].isdisjoint(set(range(3)))
    # cap respected; user 3 rated everything -> no negatives at all
    assert len(by_user[1]) == 7 and len(by_user[2]) == 7
    assert 3 not in by_user
    # deterministic: a second run yields the identical set
    out2 = negative_samples(r, pool_size=100, per_user=7).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


# --- cross-query invariants -------------------------------------------------

def test_transition_probs_sum_to_one_per_source(spark, sf_dir):
    from recsys_spark_spark.plans.windows_extra import events_transition_matrix

    rows = events_transition_matrix(spark, sf_dir).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r["prob"])
    assert by_from
    for ft, probs in by_from.items():
        # each prob is 6-dp rounded -> sum within n*5e-7 of exactly 1
        assert abs(sum(probs) - 1.0) <= len(probs) * 5e-7, (ft, sum(probs))


def test_rfm_quartiles_are_balanced(spark, sf_dir):
    from collections import Counter

    from recsys_spark_spark.plans.windows_extra import customer_rfm_segments

    rows = customer_rfm_segments(spark, sf_dir).collect()
    for col in ("r_q", "f_q", "m_q"):
        sizes = Counter(r[col] for r in rows)
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (col, sizes)


# --- SCD2 history -----------------------------------------------------------

def test_scd2_collapses_unchanged_and_chains_intervals(spark):
    from recsys_spark_spark.plans.windows_extra import scd2_history

    sec = dt.timedelta(seconds=1)
    rows = [
        (1, TS0 + i * sec, 1, "e", v)
        for i, v in enumerate([5.0, 5.0, 7.0, 7.0, 5.0])
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = sorted(
        scd2_history(e).collect(), key=lambda r: r["valid_from"]
    )
    assert [r["value"] for r in out] == [5.0, 7.0, 5.0]
    # half-open chain: each valid_to equals the next valid_from
    assert out[0]["valid_to"] == out[1]["valid_from"]
    assert out[1]["valid_to"] == out[2]["valid_from"]
    assert [r["is_current"] for r in out] == [0, 0, 1]


def test_scd2_null_values_open_their_own_interval(spark):
    from recsys_spark_spark.plans.windows_extra import scd2_history

    sec = dt.timedelta(seconds=1)
    rows = [
        (1, TS0, 1, "e", 5.0),
        (2, TS0 + sec, 1, "e", None),   # NULL period must appear
        (3, TS0 + 2 * sec, 1, "e", 5.0),
        # user 2 STARTS with NULL: first row must still be kept
        (10, TS0, 2, "e", None),
        (11, TS0 + sec, 2, "e", None),  # unchanged NULL collapses
        (12, TS0 + 2 * sec, 2, "e", 3.0),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {}
    for r in scd2_history(e).collect():
        out.setdefault(r["user_id"], []).append(r)
    u1 = sorted(out[1], key=lambda r: r["valid_from"])
    assert [r["value"] for r in u1] == [5.0, None, 5.0]
    u2 = sorted(out[2], key=lambda r: r["valid_from"])
    assert [r["value"] for r in u2] == [None, 3.0]
    assert [r["is_current"] for r in u2] == [0, 1]


# --- gap filling ------------------------------------------------------------

def test_daily_dense_fills_gaps_and_carries_forward(spark):
    from recsys_spark_spark.plans.windows_extra import daily_dense

    day = dt.timedelta(days=1)
    rows = (
        [(i, TS0, 1, "a", 10.0) for i in range(2)]          # day 0: mean 10
        + [(10, TS0 + day, 1, "a", 20.0)]                   # day 1: mean 20
        + [(20, TS0 + 3 * day, 1, "a", 40.0)]               # day 3 (day 2 GAP)
        + [(30, TS0 + day, 1, "b", 5.0)]                    # b only on day 1
    )
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {(r["event_type"], r["day"]): r for r in daily_dense(e).collect()}
    # dense spine: global span (4 days) x both types
    assert len(out) == 8
    gap = out[("a", "2024-01-03")]
    assert (gap["n_events"], gap["had_data"]) == (0, 0)
    assert gap["mean_value_ffill"] == 20.0  # carried from day 1
    assert out[("a", "2024-01-04")]["mean_value_ffill"] == 40.0
    # b has no data before day 1: zero-filled row with NULL carry
    b0 = out[("b", "2024-01-01")]
    assert (b0["n_events"], b0["mean_value_ffill"]) == (0, None)
    assert out[("b", "2024-01-04")]["mean_value_ffill"] == 5.0


# --- fuzzy record linkage ---------------------------------------------------

def test_fuzzy_pairs_hand_computed(spark):
    from recsys_spark_spark.plans.linkage import fuzzy_pairs

    names = spark.createDataFrame(
        [("abc",), ("abd",), ("abcd",), ("xyz",), ("abc",)], "name string"
    )
    out = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in fuzzy_pairs(names).collect()
    }
    # substitution, insertion, and insertion-vs-substituted all at d=1
    assert out == {
        ("abc", "abd"): 1,
        ("abc", "abcd"): 1,
        ("abcd", "abd"): 1,
    }


def test_fuzzy_pairs_bucket_cap_drops_hot_variants(spark):
    from recsys_spark_spark.plans.linkage import fuzzy_pairs

    names = spark.createDataFrame(
        [("abc",), ("abd",), ("abcd",)], "name string"
    )
    # cap 1 drops every shared variant bucket -> no candidates at all
    assert fuzzy_pairs(names, max_bucket=1).count() == 0


# --- NDCG@k -----------------------------------------------------------------

def test_ndcg_hand_computed(spark):
    import math

    from recsys_spark_spark.metrics.evaluation import ranking_metrics

    # user 1: hits at ranks 1 and 3; 2 relevant items -> IDCG = g1+g2
    rec = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 10, 1)],
        "user_id long, item_id long, rank int",
    )
    rel = spark.createDataFrame(
        [(1, 10), (1, 12)], "user_id long, item_id long"
    )
    out = {r["user_id"]: r for r in ranking_metrics(spark, rec, rel, k=3).collect()}
    g = lambda r: 1.0 / math.log2(r + 1)
    expected = (g(1) + g(3)) / (g(1) + g(2))
    assert abs(out[1]["ndcg_at_k"] - expected) < 1e-12
    assert out[2]["ndcg_at_k"] == 0.0  # no relevant items -> 0


def test_ndcg_perfect_ranking_is_one(spark):
    from recsys_spark_spark.metrics.evaluation import ranking_metrics

    rec = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "user_id long, item_id long, rank int"
    )
    rel = spark.createDataFrame(
        [(1, 10), (1, 11)], "user_id long, item_id long"
    )
    row = ranking_metrics(spark, rec, rel, k=2).collect()[0]
    assert abs(row["ndcg_at_k"] - 1.0) < 1e-12


def test_mrr_hand_computed(spark):
    from recsys_spark_spark.metrics.evaluation import ranking_metrics

    rec = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 10, 1), (2, 11, 2)],
        "user_id long, item_id long, rank int",
    )
    rel = spark.createDataFrame(
        [(1, 11), (2, 99)], "user_id long, item_id long"
    )
    out = {r["user_id"]: r["rr_at_k"] for r in ranking_metrics(spark, rec, rel, k=2).collect()}
    assert out[1] == 0.5   # first hit at rank 2
    assert out[2] == 0.0   # relevant item never recommended


def test_ranking_metrics_scores_unrecommended_users_as_zero(spark):
    """Regression: a user holding relevant items but receiving no
    recommendations must appear in the per-user metrics with zeros,
    not vanish from the averages."""
    from recsys_spark_spark.metrics.evaluation import ranking_metrics

    rec = spark.createDataFrame(
        [(1, 10, 1)], "user_id long, item_id long, rank int"
    )
    rel = spark.createDataFrame(
        [(1, 10), (2, 20)], "user_id long, item_id long"
    )
    out = {r["user_id"]: r for r in ranking_metrics(spark, rec, rel, k=1).collect()}
    assert set(out) == {1, 2}
    u2 = out[2]
    assert (u2["p_at_k"], u2["r_at_k"], u2["ap_at_k"], u2["ndcg_at_k"],
            u2["rr_at_k"]) == (0.0, 0.0, 0.0, 0.0, 0.0)


# --- bucketized interval join ------------------------------------------------

def test_events_in_anomaly_windows_merge_and_pad(spark):
    """Two adjacent spike days island-merge into ONE padded window;
    the ±6 h pad pulls in off-day events near the boundary and the
    containment filter excludes events just past it; other event
    types never match a click window."""
    from recsys_spark_spark.plans.windows_extra import (
        anomaly_windows,
        events_in_windows,
    )

    rows, eid = [], 0
    # 8 baseline days (Jan 1-8) of 10/12 clicks at 12:00
    for day in range(8):
        for _ in range(10 if day % 2 == 0 else 12):
            rows.append((eid, TS0 + dt.timedelta(days=day), 1, "click"))
            eid += 1
    # adjacent spikes: Jan 9 = 100, Jan 10 = 400 (both flag despite
    # day 9 polluting day 10's trailing baseline)
    for n, day in ((100, 8), (400, 9)):
        for _ in range(n):
            rows.append((eid, TS0 + dt.timedelta(days=day), 1, "click"))
            eid += 1
    # boundary probes: window should be [Jan 8 18:00, Jan 11 06:00)
    probe = {
        "in_before": (dt.datetime(2024, 1, 8, 19, 0), True),
        "out_before": (dt.datetime(2024, 1, 8, 17, 0), False),
        "in_after": (dt.datetime(2024, 1, 11, 5, 0), True),
        "out_after": (dt.datetime(2024, 1, 11, 7, 0), False),
    }
    probe_ids = {}
    for name, (ts, _) in probe.items():
        rows.append((eid, ts, 1, "click"))
        probe_ids[name] = eid
        eid += 1
    # views during the spike never match (windows are per-type)
    for _ in range(5):
        rows.append((eid, TS0 + dt.timedelta(days=8), 2, "view"))
        eid += 1

    e = _events(spark, rows)
    wins = anomaly_windows(e).collect()
    assert [
        (w["event_type"], str(w["w_start"]), str(w["w_end"])) for w in wins
    ] == [("click", "2024-01-08 18:00:00", "2024-01-11 06:00:00")]

    out = events_in_windows(e, anomaly_windows(e)).collect()
    got = {r["event_id"] for r in out}
    assert all(r["event_type"] == "click" for r in out)
    assert {r["window_start"] for r in out} == {"2024-01-08 18:00:00"}
    for name, (_, expect_in) in probe.items():
        assert (probe_ids[name] in got) is expect_in, name
    # 100 + 400 spike events + the two in-window probes
    assert len(out) == 502


def test_dau_wau_stickiness_trailing_semantics(spark):
    """WAU(d) sees the full trailing week even across inactive days,
    and only observed days are emitted."""

    def day(d):
        return dt.datetime(2024, 3, 1 + d, 10, 0, 0)

    rows = [
        (1, day(0), 100, "view"),   # A active day 0
        (2, day(0), 200, "view"),   # B active day 0
        (3, day(4), 200, "view"),   # B again day 4
        (4, day(8), 300, "view"),   # C day 8 (A/B's day-0 is outside
                                    # [day 2, day 8]; B's day-4 inside)
    ]
    from recsys_spark_spark.plans.windows_extra import dau_wau_stickiness

    out = {
        r["day"]: (r["dau"], r["wau"])
        for r in dau_wau_stickiness(_events(spark, rows)).collect()
    }
    assert out == {
        "2024-03-01": (2, 2),   # A+B
        "2024-03-05": (1, 2),   # B active; trailing week = {A, B}
        "2024-03-09": (1, 2),   # C active; trailing week = {B, C}
    }


def test_events_in_windows_multi_match_on_overlap(spark):
    """events_in_windows is a genuine multi-match join: an event inside
    two overlapping windows of its type yields one row per window.
    (At the shipped INCIDENT_PAD_H=6 same-type incident windows cannot
    overlap — islands are >= 1 day apart, so overlap needs pad >= 12 h
    — but the operator accepts arbitrary windows and must multi-match;
    this pins that path.)"""
    import datetime as dt2

    from recsys_spark_spark.plans.windows_extra import events_in_windows

    e = _events(spark, [(1, dt2.datetime(2024, 5, 2, 1, 0), 7, "click")])
    wins = spark.createDataFrame(
        [
            ("click", dt2.datetime(2024, 5, 1, 18, 0), dt2.datetime(2024, 5, 2, 6, 0)),
            ("click", dt2.datetime(2024, 5, 2, 0, 0), dt2.datetime(2024, 5, 3, 6, 0)),
            ("view", dt2.datetime(2024, 5, 1, 0, 0), dt2.datetime(2024, 5, 4, 0, 0)),
        ],
        "event_type string, w_start timestamp, w_end timestamp",
    )
    out = events_in_windows(e, wins).collect()
    assert len(out) == 2
    assert {r["window_start"] for r in out} == {
        "2024-05-01 18:00:00",
        "2024-05-02 00:00:00",
    }


def test_zipf_fit_recovers_planted_power_law(spark):
    """A corpus built with freq(rank) ∝ 1/rank must fit slope ≈ −1
    with near-perfect R²; a uniform corpus fits slope ≈ 0."""
    from recsys_spark_spark.plans.text import zipf_fit

    power = " ".join(
        " ".join([f"tok{r}"] * (1000 // r)) for r in range(1, 51)
    )
    d = spark.createDataFrame([(1, power)], "doc_id long, text string")
    out = zipf_fit(d, top_n=50).first()
    assert out["n_tokens"] == 50
    assert -1.1 < out["slope"] < -0.9, out["slope"]
    assert out["r2"] > 0.98

    uniform = " ".join(" ".join([f"u{r}"] * 20) for r in range(50))
    du = spark.createDataFrame([(1, uniform)], "doc_id long, text string")
    flat = zipf_fit(du, top_n=50).first()
    assert abs(flat["slope"]) < 0.05, flat["slope"]


def test_readability_hand_computed(spark):
    """'the cat sat. on a mat!' → 6 words, 2 sentences, 6 vowel groups
    (e,a,a,o,a,a); a punctuation-free fragment clamps to 1 sentence."""
    from recsys_spark_spark.plans.text import readability

    docs = spark.createDataFrame(
        [(1, "the cat sat. on a mat!"), (2, "no punctuation here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability(docs).collect()}
    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (6, 2, 6)
    expected = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    exp6 = math.floor(expected * 1e6 + 0.5) / 1e6
    assert abs(r1["flesch"] - exp6) < 2e-6
    assert out[2]["n_sentences"] == 1  # clamp


def test_char_entropy_empty_doc_pins_zero(spark, tmp_path):
    """Spark's split(text, '') yields [''] for an empty string (DuckDB's
    string_split yields []) — the r6 ADVICE latent: without the
    empty-element filter an empty document scored (1, 1, 0.0) on the
    Spark side vs the oracle's (0, 0, 0.0).  Pin the fixed behavior on
    BOTH engines over a corpus that actually contains an empty doc.
    The entropy columns live in doc_quality_scores since the r8
    rotation merged doc_char_entropy into it (same per-doc grain)."""
    import duckdb

    from recsys_spark_spark.plans.registry import DEMOTED, QUERIES, _load_all

    _load_all()
    spec = {**QUERIES, **DEMOTED}["doc_quality_scores"]
    d = spark.createDataFrame(
        [(1, "en", ""), (2, "en", "aab")], "doc_id long, lang string, text string"
    )
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in spec.fn(spark, str(tmp_path)).collect()}
    assert (out[1]["n_chars"], out[1]["n_distinct_chars"]) == (0, 0)
    assert out[1]["entropy_nats"] == 0.0
    # 'aab': p = (2/3, 1/3) → H = ln 3 − (2/3) ln 2 ≈ 0.6365 nats
    assert out[2]["n_chars"] == 3 and out[2]["n_distinct_chars"] == 2
    assert abs(out[2]["entropy_nats"] - 0.636514) < 5e-6
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    odf = con.sql(spec.oracle).df().set_index("doc_id")
    con.close()
    for doc_id, row in out.items():
        orow = odf.loc[doc_id]
        assert int(orow["n_chars"]) == row["n_chars"]
        assert int(orow["n_distinct_chars"]) == row["n_distinct_chars"]
        assert round(float(orow["entropy_nats"]), 6) == round(
            row["entropy_nats"], 6
        )


def test_sessions_chunked_equals_plain_on_boundary_cases(spark, tmp_path):
    """The bounded-task twin must equal the plain window form on the
    adversarial boundary shapes: a session SPANNING three day-chunks
    (each boundary merge subtracts exactly one), a gap of exactly
    1800 s (same-session by the > rule, merged across a boundary),
    a gap of 1801 s straddling a boundary (NOT merged), and a user
    absent for whole chunks (no spurious merge across the hole)."""
    import pyspark.sql.functions as F

    from recsys_spark_spark.plans.relational import (
        events_sessions,
        events_sessions_chunked,
    )

    day = 86_400
    rows = []
    # user 1: one session spanning 3 chunks — events every 1000 s
    # from 1000 s before midnight #1 to 1000 s after midnight #2
    t = day - 1000
    eid = 0
    while t <= 2 * day + 1000:
        rows.append((eid, 1, t)); eid += 1
        t += 1000
    # user 2: gap of exactly 1800 straddling a boundary (same session)
    rows += [(100, 2, day - 900), (101, 2, day + 900)]
    # user 3: gap of 1801 straddling a boundary (two sessions)
    rows += [(200, 3, day - 900), (201, 3, day + 901)]
    # user 4: present in chunk 0 and chunk 3 only (hole -> 2 sessions)
    rows += [(300, 4, 100), (301, 4, 3 * day + 100)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, off long")
    (
        df.select(
            "event_id",
            "user_id",
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(secs=F.col("off").cast("double"))
            ).alias("ts"),
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/events.parquet")
    )
    plain = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in events_sessions(spark, str(tmp_path)).collect()
    }
    chunked = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in events_sessions_chunked(spark, str(tmp_path)).collect()
    }
    assert chunked == plain
    assert plain[1][0] == 1  # 3-chunk session counts once
    assert plain[2][0] == 1  # exactly-1800 gap: same session
    assert plain[3][0] == 2  # 1801 gap: split
    assert plain[4][0] == 2  # chunk hole: no spurious merge


def test_running_revenue_chunked_bit_equals_plain(spark, sf_dir):
    """The prefix-sum twin must BIT-equal the sequential window —
    decimal money arithmetic is associative, so no rounding tolerance
    is needed (doubles measurably flipped cents here: 6/14,743 rows at
    sf0.01 before the r9 decimal migration)."""
    from recsys_spark_spark.plans.windows_extra import (
        customer_running_revenue,
        customer_running_revenue_chunked,
    )

    cols = ["custkey", "order_date", "orderkey", "running_revenue"]
    a = (
        customer_running_revenue(spark, sf_dir)
        .toPandas()[cols]
        .sort_values(cols[:3])
        .reset_index(drop=True)
    )
    b = (
        customer_running_revenue_chunked(spark, sf_dir)
        .toPandas()[cols]
        .sort_values(cols[:3])
        .reset_index(drop=True)
    )
    assert len(a) > 0 and a.equals(b)


def test_chunked_running_sum_rejects_double_values(spark):
    """The generic helper refuses a double value column — float
    addition re-associates, so a parallel prefix sum over doubles can
    never promise bit-equality with the sequential window."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from recsys_spark_spark.plans.windows_extra import chunked_running_sum

    t = spark.createDataFrame(
        [(1, 1, 1.0)], "k long, o long, v double"
    )
    with _pytest.raises(ValueError, match="exact val_col"):
        chunked_running_sum(t, "k", ["o"], "v", F.col("o"), "rs", 2)


def test_prev_gap_chunked_equals_plain_on_boundaries(spark, tmp_path):
    """The chunked lag twin must equal the plain window on chunk-edge
    shapes: consecutive events straddling a midnight boundary, a
    same-second tie pair at the boundary (event_id breaks the tie
    inside ONE chunk — ties can never split), a user whose chunks have
    holes, and each user's first event (NULL gap)."""
    import pyspark.sql.functions as F

    from recsys_spark_spark.plans.relational import (
        events_prev_gap,
        events_prev_gap_chunked,
    )

    day = 86_400
    rows = [
        # user 1: events 10 s either side of two midnights + a hole
        (0, 1, day - 10), (1, 1, day + 10), (2, 1, 3 * day + 5),
        # user 2: same-second tie right at a boundary second
        (10, 2, day), (11, 2, day), (12, 2, day + 30),
        # user 3: single event (NULL gap only)
        (20, 3, 500),
    ]
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
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    plain = {
        r["event_id"]: r["gap_s"]
        for r in events_prev_gap(spark, str(tmp_path)).collect()
    }
    chunked = {
        r["event_id"]: r["gap_s"]
        for r in events_prev_gap_chunked(spark, str(tmp_path)).collect()
    }
    assert chunked == plain
    assert plain[1] == 20  # carried across the midnight boundary
    assert plain[2] == 2 * day - 5  # carried across a chunk hole
    assert plain[11] == 0 and plain[12] == 30  # tie pair intact
    assert plain[0] is None and plain[20] is None  # first events

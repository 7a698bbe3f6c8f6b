"""Round-12-born surfaces: the self-driving window-twin switch
(plan-time skew audit -> measured crossover table -> plain/chunked
dispatch) and its auto-dispatch registry row.

The auto row (orders_rolling_7d_revenue_auto) also rides
tests/test_oracle_parity.py like every oracled query — its oracle
re-derives BOTH the audit value and the dispatch decision, so the
value hash certifies the switch against an independent computation.
Here: the dispatch mechanics, the laziness contract (only the chosen
plan is built), and the planted-hot-key path where the audit drives
the CHUNKED branch with bit-equal output.
"""

from __future__ import annotations

import pytest

from recsys_spark_spark.operators.twin_switch import (
    CARRY_CLASS_CROSSOVER_ROWS,
    hot_key_rows_of,
    windowed_form,
)


@pytest.fixture(scope="module")
def queries():
    from recsys_spark_spark.plans.registry import DEMOTED, QUERIES, _load_all

    _load_all()
    return {**QUERIES, **DEMOTED}


@pytest.mark.parametrize("carry_class", sorted(CARRY_CLASS_CROSSOVER_ROWS))
def test_windowed_form_dispatch_both_sides_of_threshold(spark, carry_class):
    """Every measured carry class: one row under the threshold stays
    plain, the threshold itself (and past it) goes chunked, and ONLY
    the chosen thunk is ever constructed — the loser's plan must not
    be built (an eager loser would double plan-compile cost at scale
    and defeat the point of dispatching)."""
    thr = CARRY_CLASS_CROSSOVER_ROWS[carry_class]
    built = []

    def plain():
        built.append("plain")
        return "PLAIN_DF"

    def chunked():
        built.append("chunked")
        return "CHUNKED_DF"

    df, form = windowed_form(plain, chunked, carry_class, thr - 1)
    assert (df, form) == ("PLAIN_DF", "plain") and built == ["plain"]
    built.clear()
    df, form = windowed_form(plain, chunked, carry_class, thr)
    assert (df, form) == ("CHUNKED_DF", "chunked") and built == ["chunked"]


def test_windowed_form_unmeasured_class_raises(spark):
    """Unmeasured carry classes raise BY DESIGN — a new twin needs its
    stress measurement before it can be auto-selected."""
    with pytest.raises(ValueError, match="unmeasured carry class"):
        windowed_form(lambda: 1, lambda: 2, "made_up_class", 10**9)


def test_hot_key_rows_of_counts_hottest_nonnull_key(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,), (None,), (None,), (None,)],
        "k long",
    )
    assert hot_key_rows_of(df, "k") == 3
    assert hot_key_rows_of(df.where("k IS NULL"), "k") == 0


def test_planted_hot_key_drives_chunked_branch_bit_equal(spark):
    """THE end-to-end certification (r11 VERDICT #3): plant a hot key
    PAST the range_frame threshold in a synthetic orders table, let
    the audit read it, assert the chunked plan is chosen, and assert
    the chunked output is bit-equal to the plain form on the same
    data — the dispatch may never change the answer, only the plan."""
    from pyspark.sql import functions as F

    from recsys_spark_spark.plans.windows_extra import (
        ROLLING_SPAN_S,
        rolling_span_revenue,
        rolling_span_revenue_chunked,
    )

    thr = CARRY_CLASS_CROSSOVER_ROWS["range_frame"]
    n_hot = thr + 10_000
    # hot customer 7: n_hot orders, ~86 per day over ~16 years; two
    # cold customers for contrast.  DECIMAL-safe money via cents.
    hot = spark.range(n_hot).select(
        F.col("id").alias("o_orderkey"),
        F.lit(7).alias("o_custkey"),
        (F.col("id") % 997 / F.lit(100)).alias("o_totalprice"),
        F.timestamp_seconds(
            F.lit(1_500_000_000) + F.col("id") * 1000
        ).cast("timestamp_ntz").alias("o_orderdate"),
    )
    cold = spark.range(50).select(
        (F.col("id") + n_hot).alias("o_orderkey"),
        (F.col("id") % 2 + 100).alias("o_custkey"),
        F.lit(10.0).alias("o_totalprice"),
        F.timestamp_seconds(
            F.lit(1_500_000_000) + F.col("id") * 40_000
        ).cast("timestamp_ntz").alias("o_orderdate"),
    )
    o = hot.unionByName(cold)

    audited = hot_key_rows_of(o, "o_custkey")
    assert audited == n_hot >= thr
    df, form = windowed_form(
        lambda: rolling_span_revenue(o, ROLLING_SPAN_S),
        lambda: rolling_span_revenue_chunked(
            o, ROLLING_SPAN_S, 4 * ROLLING_SPAN_S
        ),
        "range_frame",
        audited,
    )
    assert form == "chunked"
    plain_df = rolling_span_revenue(o, ROLLING_SPAN_S)
    assert df.exceptAll(plain_df).count() == 0
    assert plain_df.exceptAll(df).count() == 0


def test_overfetch_recall_vs_exact(spark, sf_dir):
    """Over-fetch route recall against the EXACT miner under the full
    predicate (label mismatch + near-dup sim cap) — the same audit
    discipline as the pushed filtered-ANN forms (the recall-audit
    variants).  Measured 0.87 at sf0.01 with the selectivity-aware
    probe expansion (0.65 without it — the sweep lives in
    plans/ann.py::HARD_NEG_OVERFETCH_PROBES); floor set under the
    measurement with headroom for tie-order jitter."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from recsys_spark_spark.plans.ann import (
        HARD_NEG_K,
        HARD_NEG_SIM_CAP,
        KNN_QUERIES,
        embedding_hard_negatives_overfetch,
        hard_negatives,
    )
    from recsys_spark_spark.sources.readers import table

    e = table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("match_id"))
    exact = (
        hard_negatives(e, KNN_QUERIES, 499)
        .where(F.col("sim") <= HARD_NEG_SIM_CAP)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= HARD_NEG_K)
    )
    got = embedding_hard_negatives_overfetch(spark, sf_dir)
    ex = {(r["query_id"], r["match_id"]) for r in exact.collect()}
    ov = {(r["query_id"], r["match_id"]) for r in got.collect()}
    assert len(ex) == KNN_QUERIES * HARD_NEG_K
    recall = len(ex & ov) / len(ex)
    assert recall >= 0.80, f"over-fetch recall regressed: {recall:.3f}"


def test_auto_row_picks_plain_at_test_scale(spark, sf_dir, queries):
    """At sf0.01 the hottest customer holds a handful of orders —
    far under the 500k crossover — so the auto row must run (and
    label) the plain form, with the audit value riding as data."""
    df = queries["orders_rolling_7d_revenue_auto"].fn(spark, sf_dir)
    row = df.select("form", "hot_key_rows").distinct().collect()
    assert len(row) == 1
    assert row[0]["form"] == "plain"
    assert 0 < row[0]["hot_key_rows"] < CARRY_CLASS_CROSSOVER_ROWS[
        "range_frame"
    ]


def test_url_canonicalization_channels_hand_computed(spark):
    """Every canonicalization rule against hand-written URLs — scheme
    fold + case, www strip, host lowercase, default-port strip (both),
    non-default port KEPT, query strip, fragment strip, trailing-slash
    strip, and the identity of an already-canonical URL."""
    from recsys_spark_spark.plans.text import canonical_url_sql

    cases = [
        ("https://www.Ex.ORG/doc/1", "ex.org/doc/1"),
        ("HTTP://EX.org/doc/1", "ex.org/doc/1"),  # scheme folded out
        ("https://ex.org:443/doc/1", "ex.org/doc/1"),
        ("http://ex.org:80/doc/1", "ex.org/doc/1"),
        ("http://ex.org:8080/doc/1", "ex.org:8080/doc/1"),  # kept
        ("https://ex.org/doc/1?utm_source=a&b=2", "ex.org/doc/1"),
        ("https://ex.org/doc/1#frag", "ex.org/doc/1"),
        ("https://ex.org/doc/1///", "ex.org/doc/1"),
        ("https://ex.org/doc/1?q=1#f", "ex.org/doc/1"),
        ("https://wwwx.ex.org/p", "wwwx.ex.org/p"),  # only 'www.' strips
        ("https://ex.org", "ex.org"),  # no path at all
    ]
    df = spark.createDataFrame(cases, "url string, expected string")
    from pyspark.sql import functions as F

    got = df.select(
        "url",
        "expected",
        F.expr(canonical_url_sql("url")).alias("canon"),
    ).collect()
    for r in got:
        assert r["canon"] == r["expected"], (r["url"], r["canon"])


def test_url_dedup_groups_are_real_and_keeper_is_min(spark, sf_dir):
    """The planted noise channels must actually COLLIDE across docs
    (the query is vacuous if every canonical URL is unique), the
    keeper must be the group min, and exactly one keeper per group.
    Runs the LIBRARY form (plans/text.py keeps the richer url +
    is_keeper columns); the registry row lives in the merged
    dedup_docs relation since r14 — see
    test_merged_dedup_docs_url_variant_matches_library below."""
    from recsys_spark_spark.plans.text import doc_url_canonical_dedup

    df = doc_url_canonical_dedup(spark, sf_dir)
    rows = df.collect()
    assert any(r["n_group_docs"] > 1 for r in rows), "no duplicate groups"
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r["canonical_url"], []).append(r)
    for canon, grp in by_canon.items():
        keeper = min(r["doc_id"] for r in grp)
        assert all(r["keeper_doc_id"] == keeper for r in grp)
        assert sum(r["is_keeper"] for r in grp) == 1
        assert all(r["n_group_docs"] == len(grp) for r in grp)


def test_merged_dedup_docs_url_variant_matches_library(spark, sf_dir, queries):
    """The r14 merge must not have changed the URL-dedup semantics:
    the merged row's 'url_canonical' variant slice == the standalone
    library form projected onto the shared grain."""
    from pyspark.sql import functions as F

    from recsys_spark_spark.plans.text import doc_url_canonical_dedup

    merged = (
        queries["dedup_docs"]
        .fn(spark, sf_dir)
        .where(F.col("variant") == "url_canonical")
        .select("doc_id", "dup_key", "keeper_doc_id", "n_group_docs", "is_dup")
    )
    lib = doc_url_canonical_dedup(spark, sf_dir).select(
        "doc_id",
        F.col("canonical_url").alias("dup_key"),
        "keeper_doc_id",
        "n_group_docs",
        (~F.col("is_keeper")).cast("int").alias("is_dup"),
    )
    assert merged.exceptAll(lib).count() == 0
    assert lib.exceptAll(merged).count() == 0

"""HLL sketch rollup properties: accuracy vs exact distinct, exact
mergeability (union-of-sketches == sketch-of-union), and layout
insensitivity (same estimate under any repartitioning).  Sketch
registers are engine-specific, so there is no DuckDB oracle by nature
— these properties ARE the correctness contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from recsys_spark_spark.operators.sketches import (
    LG_K,
    daily_user_sketches,
    rollup_sketches,
)
from recsys_spark_spark.sources.readers import table


def test_daily_estimates_within_hll_error(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    est = {
        r["day"]: r["est_users"]
        for r in daily_user_sketches(e).collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact) and exact
    # 2^12 registers → ~1.6% standard error; 5% is > 3 sigma
    for day, n in exact.items():
        assert abs(est[day] - n) / n <= 0.05, (day, est[day], n)


def test_union_of_sketches_equals_sketch_of_union(spark, sf_dir):
    """The mergeability contract: rolling up persisted daily sketches
    must equal sketching the raw union — EXACTLY (register max is
    associative), not just approximately."""
    e = table(spark, sf_dir, "events")
    merged = rollup_sketches(daily_user_sketches(e)).collect()[0][
        "est_users_total"
    ]
    direct = e.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(LG_K))
        ).alias("x")
    ).collect()[0]["x"]
    assert merged == direct


def test_estimate_is_layout_insensitive(spark, sf_dir):
    """HLL updates are max() ops — the same input multiset must give
    the same estimate under any partitioning."""
    e = table(spark, sf_dir, "events")
    a = rollup_sketches(daily_user_sketches(e)).collect()[0][0]
    b = rollup_sketches(
        daily_user_sketches(e.repartition(17, "event_id"))
    ).collect()[0][0]
    c = rollup_sketches(daily_user_sketches(e.coalesce(1))).collect()[0][0]
    assert a == b == c


# --- fixed-bin histogram quantile sketch -----------------------------------

from recsys_spark_spark.operators.sketches import (  # noqa: E402
    histogram_quantiles,
    histogram_sketch,
    merge_histograms,
)


def _valued(spark, rows):
    """rows: (grp, value)"""
    return spark.createDataFrame(rows, "grp string, value double")


def test_histogram_quantiles_hand_computed(spark):
    # 10 values 5,15,...,95 in bins 0..9 (w=10): n_total=10
    rows = [("a", 10.0 * i + 5.0) for i in range(10)]
    out = {
        r["q"]: r
        for r in histogram_quantiles(
            histogram_sketch(_valued(spark, rows), ["grp"], "value"),
            ["grp"],
            qs=(0.5, 0.9),
        ).collect()
    }
    # p50: rq=5, bin 4 is first with cum>=5 (cum 5), est = 40 + 10*(5-4)/1
    assert out[0.5]["n_total"] == 10
    assert out[0.5]["est"] == 50.0
    # p90: rq=9, bin 8 (cum 9), est = 80 + 10*(9-8)/1 = 90
    assert out[0.9]["est"] == 90.0


def test_histogram_clamps_out_of_range_values(spark):
    rows = [("a", -50.0), ("a", 5.0), ("a", 1e9)]
    hist = {
        r["bin"]: r["n"]
        for r in histogram_sketch(_valued(spark, rows), ["grp"], "value")
        .collect()
    }
    assert hist == {0: 2, 127: 1}  # underflow joins bin 0, overflow bin 127


def test_histogram_merge_is_exact(spark, sf_dir):
    """union-of-sketches == sketch-of-union, bin for bin — addition is
    associative, so the merged daily sketch IS the direct sketch."""
    e = table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )
    daily = histogram_sketch(e, ["day", "event_type"], "value")
    merged = {
        (r["event_type"], r["bin"]): r["n"]
        for r in merge_histograms(daily, ["event_type"]).collect()
    }
    direct = {
        (r["event_type"], r["bin"]): r["n"]
        for r in histogram_sketch(e, ["event_type"], "value").collect()
    }
    assert merged == direct and merged


def test_histogram_quantile_error_bounded_by_bin_width(spark, sf_dir):
    """|est − exact order statistic| ≤ w: the estimate interpolates
    inside the bin that CONTAINS the ⌈q·n⌉-th order statistic, so the
    histogram loses only within-bin placement.  (The comparison target
    must use the same rank definition — an interpolated percentile at
    q·(n−1)+1 can sit one rank lower, which near a sparse tail is a
    different bin entirely.)"""
    import math

    e = table(spark, sf_dir, "events")
    est = {
        (r["event_type"], r["q"]): r["est"]
        for r in histogram_quantiles(
            histogram_sketch(e, ["event_type"], "value"), ["event_type"]
        ).collect()
    }
    vals: dict[str, list[float]] = {}
    for r in e.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    assert vals
    for t, xs in vals.items():
        xs.sort()
        for q in (0.5, 0.9, 0.99):
            exact = xs[math.ceil(q * len(xs)) - 1]
            assert abs(est[(t, q)] - exact) <= 10.0, (t, q, est[(t, q)], exact)


def test_histogram_quantiles_monotone_in_q(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    est = {}
    for r in histogram_quantiles(
        histogram_sketch(e, ["event_type"], "value"), ["event_type"]
    ).collect():
        est.setdefault(r["event_type"], {})[r["q"]] = r["est"]
    assert est
    for t, qs in est.items():
        assert qs[0.5] <= qs[0.9] <= qs[0.99], (t, qs)


# --- Count-Min sketch --------------------------------------------------------

def _toy_docs(spark):
    # token frequencies: heavy=40, mid=12, and 30 distinct rare tokens ×1
    rows, did = [], 0
    for _ in range(8):
        rows.append((did, " ".join(["heavy"] * 5))); did += 1
    for _ in range(4):
        rows.append((did, " ".join(["mid"] * 3))); did += 1
    rows.append((did, " ".join(f"rare{i}" for i in range(30))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cms_overestimates_and_finds_heavy_hitter_under_collisions(spark):
    """With width=8 and 32 token types, collisions are forced in every
    hash row — yet est ≥ exact must hold for EVERY token (counters only
    add) and the true heaviest token must still rank first (its
    estimate grows, everyone else's grows too, but min-of-rows damps
    collision noise)."""
    from recsys_spark_spark.operators.sketches import cms_topk_tokens

    out = cms_topk_tokens(_toy_docs(spark), k=32, depth=4, width=8).collect()
    assert all(r["est_count"] >= r["exact_count"] for r in out)
    # collisions actually happened at this width
    assert any(r["est_count"] > r["exact_count"] for r in out)
    assert out[0]["token"] == "heavy" and out[0]["exact_count"] == 40
    assert out[0]["rank"] == 1


def test_cms_exact_at_generous_width(spark):
    """At width ≫ vocab the grid is collision-free and every estimate
    is exact — the ε→0 limit of the guarantee."""
    from recsys_spark_spark.operators.sketches import cms_topk_tokens

    out = cms_topk_tokens(_toy_docs(spark), k=32, depth=4, width=4096).collect()
    assert out and all(r["est_count"] == r["exact_count"] for r in out)


def test_cms_merge_equals_sketch_of_union(spark):
    """Counter addition IS the merge: sketching two disjoint halves of
    the corpus and adding grids elementwise equals the one-shot sketch
    of the whole corpus, exactly."""
    import pyspark.sql.functions as F
    from recsys_spark_spark.operators.sketches import cms_sketch

    docs = _toy_docs(spark)

    def vocab(d):
        return (
            d.select(F.explode(F.split("text", " ")).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias("weight"))
        )

    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)
    merged = (
        cms_sketch(vocab(half_a), depth=3, width=16)
        .unionByName(cms_sketch(vocab(half_b), depth=3, width=16))
        .groupBy("r", "b")
        .agg(F.sum("c").alias("c"))
    )
    direct = cms_sketch(vocab(docs), depth=3, width=16)
    m = {(r["r"], r["b"]): r["c"] for r in merged.collect()}
    d = {(r["r"], r["b"]): r["c"] for r in direct.collect()}
    assert m == d and m


# --- KMV / bottom-k (Theta-family) oracled distinct sketch (r11) ------------


def test_kmv_estimator_formula_exact(spark):
    """Planted fixture where the kth hash is known: with k=4 and
    hashes {h1<h2<h3<h4<h5}, the sketch keeps the 4 smallest and the
    estimate is (k-1)*2^60/h4; below saturation (n<k) the estimate is
    exactly n."""
    from recsys_spark_spark.operators.sketches import (
        KMV_DOMAIN,
        kmv_bottom_k,
        kmv_estimate,
    )

    # realistic-magnitude hashes (qround's long range caps estimates
    # at ~9.2e12 — documented in kmv_estimate; tiny planted hashes
    # would fake an astronomically dense domain)
    h4 = 1 << 58
    rows = [("g1", h) for h in [1 << 55, 1 << 56, (1 << 56) + 8, h4, 1 << 59]] + [
        ("g2", h) for h in [1 << 57, 1 << 58]
    ]
    rel = spark.createDataFrame(rows, "g string, _h long")
    sk = kmv_bottom_k(rel, ["g"], k=4)
    kept = sorted(r["_h"] for r in sk.where(F.col("g") == "g1").collect())
    assert kept == [1 << 55, 1 << 56, (1 << 56) + 8, h4]
    est = {
        r["g"]: (r["n_sketch"], r["est_users"])
        for r in kmv_estimate(sk, ["g"], k=4).collect()
    }
    assert est["g1"] == (4, 3.0 * KMV_DOMAIN / h4)  # == 12.0 exactly
    assert est["g1"][1] == 12.0
    assert est["g2"] == (2, 2.0)  # unsaturated -> exact


def test_kmv_partition_insensitive(spark):
    """The sketch is a pure function of the input multiset: any
    repartitioning (different mapInPandas partials) yields the same
    bottom-k rows."""
    import random

    from recsys_spark_spark.operators.sketches import kmv_bottom_k

    rng = random.Random(7)
    rows = [("g%d" % (i % 3), rng.randrange(1 << 60)) for i in range(500)]
    rel = spark.createDataFrame(rows, "g string, _h long")
    a = sorted(map(tuple, kmv_bottom_k(rel, ["g"], k=8).collect()))
    b = sorted(
        map(tuple, kmv_bottom_k(rel.repartition(17, "_h"), ["g"], k=8).collect())
    )
    c = sorted(map(tuple, kmv_bottom_k(rel.coalesce(1), ["g"], k=8).collect()))
    assert a == b == c and len(a) == 24


def test_kmv_rollup_accuracy_and_merge(spark, sf_dir):
    """On the real table: every level's estimate is within 5 sigma
    (sigma = 1/sqrt(k-2)) of its exact count, the saturated estimator
    branch actually fires somewhere, and the merged levels are
    consistent (sketch size never exceeds k; 'all' row unique)."""
    from recsys_spark_spark.operators.sketches import KMV_K
    from recsys_spark_spark.plans.sketch import events_distinct_sketch_rollup

    rows = events_distinct_sketch_rollup(spark, sf_dir).collect()
    assert sum(1 for r in rows if r["level"] == "all") == 1
    sigma = (KMV_K - 2) ** -0.5
    for r in rows:
        assert r["n_sketch"] <= KMV_K
        rel_err = abs(r["est_users"] - r["n_exact"]) / max(r["n_exact"], 1)
        assert rel_err <= 5 * sigma, (r, rel_err)
    if any(r["n_sketch"] == KMV_K for r in rows):
        assert any(r["est_users"] != r["n_exact"] for r in rows)

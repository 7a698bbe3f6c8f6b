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

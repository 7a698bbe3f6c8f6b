"""The documented 100-TB swap paths: approx_count_distinct (HLL) and
percentile_approx (t-digest-ish) must land within tolerance of their
exact twins — the plan-shape swap the part_price_median_by_brand and
doc_stats_by_lang docstrings promise."""

from __future__ import annotations

from pyspark.sql import functions as F

from recsys_spark_spark.sources.readers import table


def test_approx_count_distinct_close(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_percentile_approx_close(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    rows = p.groupBy("p_brand").agg(
        F.percentile("p_retailprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("p_retailprice", F.lit(0.5), F.lit(10000)).alias(
            "approx"
        ),
    ).collect()
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / max(r["exact"], 1.0) < 0.05

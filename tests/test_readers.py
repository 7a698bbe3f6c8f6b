"""S1/S2 reader compat against the REFERENCE's actual data files
(read-only fixtures at /root/reference/data) — round 1 shipped the
readers untested against the real shapes."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from recsys_spark_spark.sources.readers import read_features_csv, read_ratings_csv

RATINGS_CSV = "/root/reference/data/train-fold1.csv"
FEATURES_CSV = "/root/reference/data/features.csv"

needs_ref = pytest.mark.skipif(
    not os.path.exists(RATINGS_CSV), reason="reference data not present"
)


@needs_ref
def test_ratings_csv_shape_and_schema(spark):
    df = read_ratings_csv(spark, RATINGS_CSV)
    assert df.count() == 80000
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("user_id", "int"),
        ("item_id", "int"),
        ("rating", "double"),
        ("ts", "timestamp"),
    ]


@needs_ref
def test_ratings_csv_golden_aggregates(spark):
    """Cross-check a few aggregates against an independent reader
    (DuckDB) of the same TSV."""
    df = read_ratings_csv(spark, RATINGS_CSV)
    got = df.agg(
        F.countDistinct("user_id").alias("u"),
        F.countDistinct("item_id").alias("i"),
        F.sum("rating").alias("s"),
        F.min(F.col("ts").cast("long")).alias("t0"),
        F.max(F.col("ts").cast("long")).alias("t1"),
    ).first()
    want = (
        duckdb.connect()
        .execute(
            f"""
            SELECT count(DISTINCT column0), count(DISTINCT column1),
                   sum(column2), min(column3), max(column3)
            FROM read_csv('{RATINGS_CSV}', delim='\t', header=false,
                          columns={{'column0':'INT','column1':'INT',
                                    'column2':'DOUBLE','column3':'BIGINT'}})
            """
        )
        .fetchone()
    )
    assert (got["u"], got["i"], float(got["s"]), got["t0"], got["t1"]) == (
        want[0],
        want[1],
        float(want[2]),
        want[3],
        want[4],
    )
    # MovieLens-100K facts (SURVEY §5): 943 users, ratings 1..5
    assert got["u"] == 943
    assert df.agg(F.min("rating"), F.max("rating")).first() == (1.0, 5.0)


@needs_ref
def test_features_csv_shape(spark):
    df = read_features_csv(spark, FEATURES_CSV)
    assert df.count() == 1682
    assert len(df.columns) == 20  # id + 19 genre flags
    id_col = df.columns[0]
    stats = df.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    assert (stats["lo"], stats["hi"]) == (1, 1682)
    # every feature column is a {0,1} flag (ContentRecommender
    # assembles all columns but the first — Main.scala:53-59)
    for c in df.columns[1:3]:
        vals = {r[0] for r in df.select(c).distinct().collect()}
        assert vals <= {0, 1}


def test_spread_scan_spreads_undersplit_and_noops_at_scale(spark, sf_dir):
    """r14 perf contract: spread_scan must lift a 1-task small-file
    scan to the session's default parallelism (the whole testdata star
    schema is one parquet row group per table, so every CPU-heavy
    per-row operator would otherwise run single-core) and must be the
    IDENTITY on a relation already at/above that width (the 100 TB
    regime: no gratuitous shuffle on production-sized inputs)."""
    from recsys_spark_spark.sources.readers import spread_scan, table

    par = spark.sparkContext.defaultParallelism
    docs = table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() < par  # the regime under test
    spread = spread_scan(docs)
    assert spread.rdd.getNumPartitions() == par
    # row-set identical (round-robin repartition moves, never drops)
    assert spread.count() == docs.count()
    wide = docs.repartition(par)
    assert spread_scan(wide) is wide  # no-op above the threshold

"""salted_join must equal a plain join (it is a partitioning
transform, not a semantic one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from recsys_spark_spark.functions.skew import salted_join
from recsys_spark_spark.sources.readers import table


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    plain = li.join(o, "l_orderkey").groupBy().agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("s"),
        F.sum("o_custkey").alias("c")
    ).first()
    salted = salted_join(li, o, "l_orderkey", n_salts=8).groupBy().agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("s"),
        F.sum("o_custkey").alias("c")
    ).first()
    assert (plain["n"], plain["c"]) == (salted["n"], salted["c"])
    assert abs(plain["s"] - salted["s"]) < 1e-6

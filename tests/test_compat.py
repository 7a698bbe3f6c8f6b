"""Compat API (reference class shapes) must equal the functional API."""

from __future__ import annotations

from recsys_spark_spark.compat import (
    HybridRecommenderTopK,
    ItemBasedTopKRecommender,
    UserBasedRatingRecommender,
    UserBasedTopKRecommender,
)
from recsys_spark_spark.recommenders.neighborhood import user_based_topk
from recsys_spark_spark.sources.readers import ratings_from_sales


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_user_topk_compat_equals_functional(spark, sf_dir):
    ratings = ratings_from_sales(spark, sf_dir)
    rec = UserBasedTopKRecommender(k_users=10, top_k=5).fit(ratings)
    got = rec.transform()
    want = user_based_topk(ratings, k_neighbors=10, k_items=5)
    assert _rows(got) == _rows(want)

    # one-user convenience matches the all-users frame
    uid = got.first()["user_id"]
    lst = rec.transform_user(uid)
    frame = [
        (r["item_id"], r["score"])
        for r in got.where(got.user_id == uid).orderBy("rank").collect()
    ]
    assert lst == frame


def test_hybrid_compat_runs(spark, sf_dir):
    ratings = ratings_from_sales(spark, sf_dir)
    hyb = HybridRecommenderTopK(
        UserBasedTopKRecommender(k_users=10, top_k=10),
        ItemBasedTopKRecommender(k_similar_items=10, top_k=10),
        top_k=5,
    ).fit(ratings)
    pdf = hyb.transform().toPandas()
    assert set(pdf.columns) == {"user_id", "item_id", "score", "rank"}
    assert pdf.groupby("user_id")["rank"].max().le(5).all()


def test_rating_predictor_compat(spark, sf_dir):
    ratings = ratings_from_sales(spark, sf_dir)
    pairs = ratings.select("user_id", "item_id").limit(50)
    preds = UserBasedRatingRecommender(k_users=10).fit(ratings).transform(pairs)
    pdf = preds.toPandas()
    assert set(pdf.columns) == {"user_id", "item_id", "prediction"}
    assert len(pdf) > 0


def test_sequential_compat_runs(spark, sf_dir):
    from pyspark.sql import functions as F

    from recsys_spark_spark.compat import SequentialTopKRecommender
    from recsys_spark_spark.sources.readers import table

    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    inter = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("user_id"),
        F.col("l_partkey").alias("item_id"),
        F.col("l_shipdate").alias("ts"),
    )
    rec = SequentialTopKRecommender(k=3).fit(inter)
    pdf = rec.transform().toPandas()
    assert set(pdf.columns) == {"user_id", "item_id", "score", "rank"}
    assert pdf.groupby("user_id")["rank"].max().le(3).all()


def test_content_rating_predictor_compat(spark, sf_dir):
    from recsys_spark_spark.compat import ContentBasedRatingRecommender
    from recsys_spark_spark.recommenders.content import (
        part_features,
        predict_content_based,
    )

    ratings = ratings_from_sales(spark, sf_dir)
    feats = part_features(spark, sf_dir)
    pairs = ratings.select("user_id", "item_id").limit(50)
    rec = (
        ContentBasedRatingRecommender(k_similar_items=10)
        .fit(ratings)
        .set_features(feats)
    )
    got = rec.transform(pairs)
    want = predict_content_based(ratings, feats, pairs, k_neighbors=10)
    assert _rows(got) == _rows(want)


def test_prediction_metrics_compat(spark):
    import math

    from recsys_spark_spark.compat import PredictionMetrics

    errs = [1.0, -2.0, 0.5]
    rmse, mae = PredictionMetrics(errs).get_prediction_metrics()
    assert math.isclose(rmse, math.sqrt((1 + 4 + 0.25) / 3))
    assert math.isclose(mae, 3.5 / 3)

    df = spark.createDataFrame([(e,) for e in errs], "error double")
    rmse2, mae2 = PredictionMetrics(df).get_prediction_metrics()
    assert math.isclose(rmse, rmse2) and math.isclose(mae, mae2)


def test_ranking_metrics_compat():
    from recsys_spark_spark.compat import RankingMetrics

    # reference quirks: precision /k, AP over all k prefixes
    p, r, ap = RankingMetrics(
        5, [1, 2, 3, 4, 5], {2, 4, 9}
    ).get_ranking_metrics()
    assert p == 2 / 5
    assert r == 2 / 3
    # prefixes: {1}:0/1 {1,2}:1/2 {..3}:1/3 {..4}:2/4 {..5}:2/5
    assert abs(ap - (0 + 0.5 + 1 / 3 + 0.5 + 0.4) / 5) < 1e-12
    assert RankingMetrics(5, [1], set()).get_ranking_metrics()[1] == 0.0

"""ALS recommender tests: output contract, no-seen-items invariant,
and prediction quality versus the item-mean baseline on the held-out
hash fold."""

from __future__ import annotations

from pyspark.sql import functions as F

from recsys_spark_spark.metrics.evaluation import (
    prediction_metrics,
    split_ratings,
)
from recsys_spark_spark.recommenders.als import als_predict, als_topk
from recsys_spark_spark.sources.readers import ratings_from_sales


def test_als_topk_contract(spark, sf_dir):
    ratings = ratings_from_sales(spark, sf_dir).cache()
    rec = als_topk(ratings, k_items=3, max_iter=5).cache()
    pdf = rec.toPandas()
    assert set(pdf.columns) == {"user_id", "item_id", "score", "rank"}
    per_user = pdf.groupby("user_id")["rank"]
    assert per_user.max().le(3).all() and (per_user.min() == 1).all()
    seen = {(r["user_id"], r["item_id"]) for r in ratings.collect()}
    assert all((u, i) not in seen for u, i in zip(pdf.user_id, pdf.item_id))


def test_als_beats_itemmean_baseline(spark, sf_dir):
    ratings = ratings_from_sales(spark, sf_dir).cache()
    train, test = split_ratings(ratings)
    preds = als_predict(train, test.select("user_id", "item_id"), max_iter=10)
    als_m = prediction_metrics(preds.join(test, ["user_id", "item_id"])).first()

    imean = train.groupBy("item_id").agg(F.avg("rating").alias("prediction"))
    base_m = prediction_metrics(test.join(imean, "item_id")).first()
    # factorization must not be materially worse than the trivial
    # baseline on held-out data (sf0.001 is tiny, so allow 10% slack)
    assert als_m["rmse"] <= base_m["rmse"] * 1.1, (als_m, base_m)

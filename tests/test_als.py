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


def test_als_topk_exact_vs_numpy_twin(spark, sf_dir):
    """The seen-masked GEMM serving path must equal a brute-force
    float64 NumPy twin over the FULL unrated catalog — pins the f32
    candidate selection + f64 refine + 6-dp quantized (score desc,
    id asc) tie-break end-to-end."""
    import numpy as np

    from recsys_spark_spark.recommenders.als import als_fit

    ratings = ratings_from_sales(spark, sf_dir).cache()
    k = 5
    got = {
        (r["user_id"], r["rank"]): (r["item_id"], r["score"])
        for r in als_topk(ratings, k_items=k).collect()
    }

    model, mu, bi, bu = als_fit(ratings)
    mu_val = float(mu.first()["mu"])
    items = sorted(
        (r["id"], r["features"]) for r in model.itemFactors.collect()
    )
    item_ids = np.array([i for i, _ in items], dtype=np.int64)
    V = np.array([f for _, f in items], dtype=np.float64)
    biv = {r["item_id"]: r["bi"] for r in bi.collect()}
    b_i = np.array([biv[i] for i in item_ids])
    buv = {r["user_id"]: r["bu"] for r in bu.collect()}
    seen: dict[int, set[int]] = {}
    for r in ratings.collect():
        seen.setdefault(r["user_id"], set()).add(r["item_id"])

    expected = {}
    for r in model.userFactors.collect():
        u = r["id"]
        s = V @ np.array(r["features"], dtype=np.float64) + b_i + (
            mu_val + buv[u]
        )
        sq = np.floor(s * 1e6 + 0.5) / 1e6
        cand = [
            (-sq[j], int(item_ids[j]))
            for j in range(len(item_ids))
            if int(item_ids[j]) not in seen.get(u, ())
        ]
        cand.sort()
        for rk, (negs, iid) in enumerate(cand[:k], start=1):
            expected[(u, rk)] = (iid, -negs)

    assert set(got) == set(expected)
    for key, (iid, sc) in expected.items():
        giid, gsc = got[key]
        assert giid == iid, (key, (giid, gsc), (iid, sc))
        assert abs(gsc - sc) < 1e-12


def test_als_topk_tight_pad_matches_default(spark, sf_dir):
    """candidate_pad == k forces the per-row margin fallback (the
    f32 boundary is never clear by MARGIN at P == k) — its output
    must equal the wide-pad fast path exactly."""
    ratings = ratings_from_sales(spark, sf_dir).cache()
    wide = als_topk(ratings, k_items=5).collect()
    tight = als_topk(ratings, k_items=5, candidate_pad=5).collect()
    assert sorted(map(tuple, wide)) == sorted(map(tuple, tight))


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


def test_als_topk_blocked_fallback_contract(spark, sf_dir):
    """The large-catalog fallback path (max_broadcast_items exceeded →
    blocked recommendForAllUsers + exact anti-join headroom) must keep
    the output contract: k per user, no seen items, contiguous
    ranks."""
    ratings = ratings_from_sales(spark, sf_dir).cache()
    rec = als_topk(ratings, k_items=3, max_broadcast_items=1).cache()
    pdf = rec.toPandas()
    per_user = pdf.groupby("user_id")["rank"]
    assert per_user.max().le(3).all() and (per_user.min() == 1).all()
    seen = {(r["user_id"], r["item_id"]) for r in ratings.collect()}
    assert all((u, i) not in seen for u, i in zip(pdf.user_id, pdf.item_id))

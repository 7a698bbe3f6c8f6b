"""ALS matrix-factorization recommender — the idiomatic MLlib path
the reference does not have (its neighborhood CF is driver-loop
k-NN; SURVEY §7 names MLlib ALS as the Spark-native counterpart).

Positioned as an ADDITION to the reference surface: the neighborhood
recommenders (recommenders/neighborhood.py) preserve reference
semantics bit-for-bit; ALS is the scale-preferred model when exact
parity is not required — factorization is O(nnz·rank) per iteration
versus the co-rated join's O(Σ n_i²) pair blow-up, and inference is
a rank-dim dot product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import qround


def _biases(ratings: DataFrame):
    """Global mean + item and user offsets (the standard baseline
    model ALS factorizes residuals against — raw ALS regularizes
    predictions toward 0, not toward the mean, which is catastrophic
    when ratings live far from 0)."""
    mu = ratings.agg(F.avg("rating").alias("mu"))
    with_mu = ratings.crossJoin(F.broadcast(mu))
    bi = with_mu.groupBy("item_id").agg(
        F.avg(F.col("rating") - F.col("mu")).alias("bi")
    )
    bu = (
        with_mu.join(bi, "item_id")
        .groupBy("user_id")
        .agg(F.avg(F.col("rating") - F.col("mu") - F.col("bi")).alias("bu"))
    )
    return mu, bi, bu


def _residuals(ratings: DataFrame, mu, bi, bu) -> DataFrame:
    return (
        ratings.crossJoin(F.broadcast(mu))
        .join(bi, "item_id")
        .join(bu, "user_id")
        .select(
            "user_id",
            "item_id",
            (F.col("rating") - F.col("mu") - F.col("bi") - F.col("bu")).alias(
                "rating"
            ),
        )
    )


def als_fit(
    ratings: DataFrame,
    rank: int = 8,
    reg: float = 5.0,
    max_iter: int = 5,
    seed: int = 42,
):
    """Fit explicit-feedback ALS on the bias-centered residuals;
    returns (model, mu, bi, bu).

    ``max_iter=5`` default: on the bias-centered residuals the rank-8
    factorization is converged by 5 sweeps (held-out RMSE identical to
    4 dp vs 10 sweeps at sf0.001 AND sf0.01 — the biases carry most of
    the signal), and each extra sweep is a full shuffle round."""
    from pyspark.ml.recommendation import ALS

    mu, bi, bu = _biases(ratings)
    resid = _residuals(ratings, mu, bi, bu)
    als = ALS(
        rank=rank,
        regParam=reg,
        maxIter=max_iter,
        seed=seed,
        userCol="user_id",
        itemCol="item_id",
        ratingCol="rating",
        coldStartStrategy="drop",
        nonnegative=False,
    )
    return als.fit(resid.select("user_id", "item_id", "rating")), mu, bi, bu


def als_topk(
    ratings: DataFrame,
    k_items: int = 5,
    rank: int = 8,
    reg: float = 5.0,
    max_iter: int = 5,
    seed: int = 42,
    headroom: int | None = None,
) -> DataFrame:
    """Top-K UNRATED items per user via ALS.

    ``recommendForAllUsers`` includes already-rated items, so we
    request ``k_items + headroom`` candidates, anti-join the user's
    rated set, and re-rank — exact w.r.t. seen-item removal as long
    as no user has more than ``headroom`` rated items inside their
    ALS top list.  ``headroom=None`` (default) computes the exact
    bound from the data — ``max(ratings per user)`` via one cheap
    aggregate — so the guarantee holds at ANY corpus size instead of
    silently degrading once some user out-rates a fixed constant
    (at sf0.1 the bound is 105; the old static 128 would have become
    an undocumented approximation on the first corpus that crossed
    it).
    Note: the candidate pool is ranked by the factorized RESIDUAL;
    the final score re-adds the bias terms, so an item outside the
    residual top-(k+headroom) with an exceptional bias could be
    missed — a documented approximation of this model-based ranker
    (widen headroom to tighten it).

    Returns ``(user_id, item_id, score, rank)``.
    """
    if headroom is None:
        # O(1) driver result, not a data collect.  NOTE: this makes
        # als_topk eager at call time (like als_fit itself already
        # is); `or 0` covers an empty ratings frame (max -> NULL).
        headroom = (
            ratings.groupBy("user_id")
            .agg(F.count("*").alias("c"))
            .agg(F.max("c"))
            .collect()[0][0]
            or 0
        )
    model, mu, bi, bu = als_fit(ratings, rank, reg, max_iter, seed)
    rec = model.recommendForAllUsers(k_items + headroom)
    flat = (
        rec.select("user_id", F.explode("recommendations").alias("r"))
        .select(
            "user_id",
            F.col("r.item_id").alias("item_id"),
            F.col("r.rating").cast("double").alias("resid"),
        )
        .crossJoin(F.broadcast(mu))
        .join(bi, "item_id")
        .join(bu, "user_id")
        .select(
            "user_id",
            "item_id",
            qround(
                F.col("resid") + F.col("mu") + F.col("bi") + F.col("bu"), 6
            ).alias("score"),
        )
    )
    fresh = flat.join(
        ratings.select("user_id", "item_id"), ["user_id", "item_id"], "left_anti"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("score"), F.asc("item_id"))
    return (
        fresh.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_items)
        .select("user_id", "item_id", "score", "rank")
    )


def als_predict(
    ratings: DataFrame,
    pairs: DataFrame,
    rank: int = 8,
    reg: float = 5.0,
    max_iter: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Predicted rating for explicit (user_id, item_id) pairs:
    μ + b_i + b_u + factorized residual."""
    model, mu, bi, bu = als_fit(ratings, rank, reg, max_iter, seed)
    return (
        model.transform(pairs.select("user_id", "item_id"))
        .crossJoin(F.broadcast(mu))
        .join(bi, "item_id")
        .join(bu, "user_id")
        .select(
            "user_id",
            "item_id",
            qround(
                F.col("prediction").cast("double")
                + F.col("mu")
                + F.col("bi")
                + F.col("bu"),
                6,
            ).alias("prediction"),
        )
    )

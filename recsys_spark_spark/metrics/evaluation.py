"""Ranking + prediction metrics as DataFrame aggregations (SURVEY §2.10).

The reference computes per-user metric tuples inside a foreach with a
driver-side accumulator and averages them on the driver
(Main.scala:96-122, accumulator/ListBufferAccumulator.scala:28-34).
Here metrics are plain aggregations over joined DataFrames — no
accumulators, no collect.

Formulas (reference metrics/RankingMetrics.scala:37-53,
PredictionMetrics.scala:35-43):
    P@k  = |selected ∩ relevant| / k
    R@k  = |selected ∩ relevant| / |relevant|   (0 when relevant empty)
    AP@k = (1/k) Σ_{i=1..k} |selected_i ∩ relevant| / i
    RMSE = √(Σe²/n),  MAE = Σ|e|/n

Documented divergence (SURVEY X3): the reference computes AP over a
Scala Set.take(i) — an UNORDERED prefix.  We use the properly ordered
ranking: selected_i = the i highest-scored items.

AP@k trick: each hit at rank r contributes Σ_{i=r..k} 1/i to the sum,
so AP = (1/k)·Σ_hits c(rank) with c precomputed — a join against a
k-row coefficient table instead of a per-user loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import qround

R6 = 6


def split_ratings(ratings: DataFrame, fold: int = 0, n_folds: int = 5):
    """Deterministic ARITHMETIC split: (user_id + item_id) % n_folds
    == fold is the test fold — reproducible in any engine, no RNG
    state, and trivially SQL-mirrorable (the oracle CTE replays it).
    Returns (train, test).

    Caveats, accepted for the oracle-checked CV queries: the modulus
    is a structured slice, not a hash — if id assignment correlates
    with rating behavior the folds are biased (production splits
    should use operators.dedup.hash60 over the pair); rows with a
    NULL key land in NEITHER fold (NULL bucket fails both filters)."""
    bucket = (F.col("user_id") + F.col("item_id")) % n_folds
    return ratings.where(bucket != fold), ratings.where(bucket == fold)


def crossval_prediction_metrics(
    ratings: DataFrame,
    predict_fn,
    n_folds: int = 5,
) -> DataFrame:
    """X6: the reference's 5-fold harness (Main.scala:61-126 runs one
    recommender per fold and averages) as ONE union plan.

    ``predict_fn(train, pairs) -> (user_id, item_id, prediction)``.
    Returns one (fold, rmse, mae, n_pairs) row per fold — the caller
    aggregates or inspects per-fold variance.  The folds share the
    (cached) ratings scan; everything else is fold-local subtrees that
    Spark schedules independently."""
    parts = []
    for fold in range(n_folds):
        train, test = split_ratings(ratings, fold=fold, n_folds=n_folds)
        preds = predict_fn(train, test.select("user_id", "item_id"))
        m = prediction_metrics(preds.join(test, ["user_id", "item_id"]))
        parts.append(m.select(F.lit(fold).alias("fold"), "rmse", "mae", "n_pairs"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def prediction_metrics(
    joined: DataFrame, pred_col: str = "prediction", actual_col: str = "rating"
) -> DataFrame:
    """RMSE/MAE over (prediction, actual) rows → one-row DataFrame
    (X4/X5, PredictionMetrics.scala:35-43)."""
    err = F.col(pred_col) - F.col(actual_col)
    return joined.agg(
        qround(F.sqrt(F.avg(err * err)), R6).alias("rmse"),
        qround(F.avg(F.abs(err)), R6).alias("mae"),
        F.count("*").alias("n_pairs"),
    )


def ap_coefficient(k: int, rank: int) -> float:
    """c(rank) = Σ_{i=rank..k} 1/i, accumulated ascending so the float
    op order matches the SQL oracle expression exactly."""
    total = 0.0
    for i in range(rank, k + 1):
        total = total + 1.0 / i
    return total


def dcg_coefficient(rank: int) -> float:
    """Binary-relevance DCG discount 1/log2(rank+1).

    Computed ONCE here in Python and shipped to both engines as the
    identical double literal (Spark ``F.lit``, oracle
    ``CAST('<repr>' AS DOUBLE)``) — log2 never runs inside either
    engine, so the one transcendental in NDCG cannot introduce
    cross-engine ulp noise."""
    import math

    return 1.0 / math.log2(rank + 1)


def idcg(k: int, n_rel: int) -> float:
    """Ideal DCG@k for n_rel relevant items: Σ_{i=1..min(k,n)} g(i),
    accumulated ascending (same literal-shipping contract)."""
    total = 0.0
    for i in range(1, min(k, n_rel) + 1):
        total = total + dcg_coefficient(i)
    return total


def ranking_metrics(
    spark: SparkSession,
    recommended: DataFrame,
    relevant: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Per-user P@k / R@k / AP@k.

    ``recommended``: (user_id, item_id, rank) with rank 1..k.
    ``relevant``: (user_id, item_id) ground-truth positives.
    Users in ``recommended`` with no relevant row score 0 (X2's
    empty-relevant rule).
    """
    coeff = spark.createDataFrame(
        [
            (r, ap_coefficient(k, r), dcg_coefficient(r))
            for r in range(1, k + 1)
        ],
        ["rank", "c", "g"],
    )
    # SET semantics, like the reference (and compat.RankingMetrics,
    # which materializes Python sets): duplicate (user, item) rows in
    # either input would multiply the hits join and push P@k past 1.0
    relevant = relevant.select("user_id", "item_id").distinct()
    hits = recommended.join(relevant, ["user_id", "item_id"]).select(
        "user_id", "rank"
    )
    per_user_hits = (
        hits.join(F.broadcast(coeff), "rank")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.sum("c").alias("c_sum"),
            F.sum("g").alias("g_sum"),
            F.min("rank").alias("first_hit"),
        )
    )
    rel_counts = relevant.groupBy("user_id").agg(F.count("*").alias("n_rel"))
    # evaluation universe = recommended ∪ relevant users: a user who
    # holds relevant items but received NO recommendations (cold-start
    # drop, empty candidate set) must score 0 in the averages — the
    # reference harness iterates test users, so dropping them would
    # silently inflate every mean
    users = (
        recommended.select("user_id")
        .unionByName(relevant.select("user_id"))
        .distinct()
    )
    return (
        users.join(per_user_hits, "user_id", "left")
        .join(rel_counts, "user_id", "left")
        .select(
            "user_id",
            (F.coalesce("n_hits", F.lit(0)) / F.lit(float(k))).alias("p_at_k"),
            F.when(
                F.col("n_rel").isNull() | (F.col("n_rel") == 0), F.lit(0.0)
            )
            .otherwise(
                F.coalesce("n_hits", F.lit(0)) / F.col("n_rel").cast("double")
            )
            .alias("r_at_k"),
            (F.coalesce("c_sum", F.lit(0.0)) / F.lit(float(k))).alias("ap_at_k"),
            _ndcg_col(k).alias("ndcg_at_k"),
            # MRR@k: reciprocal rank of the FIRST hit (pure rational
            # arithmetic — identical in both engines), 0 when no hit
            F.when(
                F.col("first_hit").isNull(), F.lit(0.0)
            )
            .otherwise(F.lit(1.0) / F.col("first_hit"))
            .alias("rr_at_k"),
        )
    )


def _ndcg_col(k: int):
    """NDCG@k (binary relevance): DCG over hit ranks ÷ ideal DCG for
    the user's relevant count; 0 when no relevant items exist.  The
    IDCG lookup is a literal CASE over n_rel (clamped at k), mirroring
    the oracle's CASE — no engine-side log anywhere."""
    ideal = F.lit(idcg(k, k))
    for n in range(k - 1, 0, -1):
        ideal = F.when(F.col("n_rel") == n, F.lit(idcg(k, n))).otherwise(
            ideal
        )
    return (
        F.when(F.col("n_rel").isNull() | (F.col("n_rel") == 0), F.lit(0.0))
        .otherwise(F.coalesce("g_sum", F.lit(0.0)) / ideal)
    )


def ranking_metrics_summary(per_user: DataFrame) -> DataFrame:
    """Mean of the per-user tuples — the reference's driver-side
    pairwise-sum average (Main.scala:113-122) as one agg."""
    return per_user.agg(
        qround(F.avg("p_at_k"), R6).alias("mean_p"),
        qround(F.avg("r_at_k"), R6).alias("mean_r"),
        qround(F.avg("ap_at_k"), R6).alias("mean_ap"),
        qround(F.avg("ndcg_at_k"), R6).alias("mean_ndcg"),
        qround(F.avg("rr_at_k"), R6).alias("mean_mrr"),
        F.count("*").alias("n_users"),
    )

"""Recommender queries with DuckDB oracles (SURVEY §2.8-2.9).

The ratings "matrix" is the recommender-shaped projection of the star
schema (FIXTURES.md §B): ``(o_custkey, l_partkey, avg(l_quantity))``
from orders ⋈ lineitem as ``(user_id, item_id, rating)``.

The oracle SQL is *generated* from the same kernel formulas the Spark
side uses (functions/similarity.py) so the two engines state the same
math; both round similarities to 9 dp BEFORE any ranking and scores to
6 dp before output, making top-k boundaries stable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import pairwise_similarity
from ..recommenders.neighborhood import item_based_topk, user_based_topk
from ..recommenders.hybrid import hybrid_topk
from ..sources.readers import ratings_from_sales
from .registry import register

# ---------------------------------------------------------------------------
# oracle SQL templates
# ---------------------------------------------------------------------------

RATINGS_CTE = """
ratings AS (
  SELECT o.o_custkey AS user_id, l.l_partkey AS item_id,
         avg(l.l_quantity) AS rating
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
)
""".strip()

#: kernel → SQL formula over pair stats (sa/sb = per-entity stats rows)
KERNEL_SQL = {
    "cosine": "dot / (sqrt(sa.ss) * sqrt(sb.ss))",
    "pearson": (
        "(dot - sa.s * sb.s / ncols.n) / "
        "(sqrt(sa.ss - sa.s * sa.s / ncols.n) * "
        "sqrt(sb.ss - sb.s * sb.s / ncols.n))"
    ),
    "euclidean": "1.0 / (sqrt(greatest(sa.ss + sb.ss - 2 * dot, 0.0)) + 1.0)",
    "jaccard": "CAST(co AS DOUBLE) / (sa.n + sb.n - co)",
}


def _sims_ctes(axis: str, kernel: str) -> str:
    """CTE chain: stats → co-rated pairs (a<b) → directed rounded sims."""
    ent, key = ("user_id", "item_id") if axis == "user" else ("item_id", "user_id")
    ncols_join = (
        ", (SELECT CAST(count(DISTINCT " + key + ") AS DOUBLE) AS n FROM ratings) ncols"
        if kernel == "pearson"
        else ""
    )
    return f"""
stats AS (
  SELECT {ent} AS ent, sum(rating) AS s, sum(rating*rating) AS ss,
         count(*) AS n
  FROM ratings GROUP BY 1
),
copairs AS (
  SELECT a.{ent} AS ea, b.{ent} AS eb,
         sum(a.rating * b.rating) AS dot, count(*) AS co
  FROM ratings a JOIN ratings b
    ON a.{key} = b.{key} AND a.{ent} < b.{ent}
  GROUP BY 1, 2
),
halfsims AS (
  SELECT ea, eb, co, {KERNEL_SQL[kernel]} AS sim
  FROM copairs
  JOIN stats sa ON sa.ent = ea
  JOIN stats sb ON sb.ent = eb{ncols_join}
),
sims AS (
  SELECT ea, eb, co, round(sim, 7) AS sim FROM halfsims
  UNION ALL
  SELECT eb, ea, co, round(sim, 7) AS sim FROM halfsims
)
""".strip()


def _pair_query_sql(axis: str, kernel: str, min_co: int) -> str:
    a, b = (f"{axis}_a", f"{axis}_b")
    return f"""
WITH {RATINGS_CTE},
{_sims_ctes(axis, kernel)}
SELECT ea AS {a}, eb AS {b}, round(sim, 4) AS sim, co
FROM sims
WHERE co >= {min_co} AND ea < eb
""".strip()


def _user_topk_sql(kernel: str, prefilter: int, k_neighbors: int, k_items: int) -> str:
    return f"""
WITH {RATINGS_CTE},
{_sims_ctes("user", kernel)},
pruned AS (
  SELECT user_id, neighbor, sim FROM (
    SELECT ea AS user_id, eb AS neighbor, sim,
           row_number() OVER (PARTITION BY ea ORDER BY sim DESC, eb ASC) AS rn
    FROM sims
  ) WHERE rn <= {prefilter}
),
cand AS (
  SELECT s.user_id, r.item_id, s.sim, s.neighbor, r.rating AS r_n
  FROM pruned s JOIN ratings r ON r.user_id = s.neighbor
  WHERE NOT EXISTS (
    SELECT 1 FROM ratings x
    WHERE x.user_id = s.user_id AND x.item_id = r.item_id)
),
topn AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id, item_id ORDER BY sim DESC, neighbor ASC) AS nrank
    FROM cand
  ) WHERE nrank <= {k_neighbors}
),
means AS (SELECT user_id, avg(rating) AS m FROM ratings GROUP BY 1),
scored AS (
  SELECT t.user_id, t.item_id,
         sum(t.sim * (t.r_n - mn.m)) / sum(t.sim) AS delta
  FROM topn t JOIN means mn ON mn.user_id = t.neighbor
  GROUP BY 1, 2
  HAVING sum(t.sim) <> 0
)
SELECT user_id, item_id, score, CAST(rk AS INTEGER) AS rank FROM (
  SELECT s.user_id, s.item_id,
         round(mu.m + s.delta, 6) AS score,
         row_number() OVER (
           PARTITION BY s.user_id
           ORDER BY round(mu.m + s.delta, 6) DESC, s.item_id ASC) AS rk
  FROM scored s JOIN means mu ON mu.user_id = s.user_id
) WHERE rk <= {k_items}
""".strip()


def _item_topk_sql(kernel: str, prefilter: int, k_neighbors: int, k_items: int) -> str:
    return f"""
WITH {RATINGS_CTE},
{_sims_ctes("item", kernel)},
pruned AS (
  SELECT item_id, neighbor_item, sim FROM (
    SELECT ea AS item_id, eb AS neighbor_item, sim,
           row_number() OVER (PARTITION BY ea ORDER BY sim DESC, eb ASC) AS rn
    FROM sims
  ) WHERE rn <= {prefilter}
),
cand AS (
  SELECT r.user_id, s.item_id, s.sim, s.neighbor_item, r.rating AS r_u
  FROM pruned s JOIN ratings r ON r.item_id = s.neighbor_item
  WHERE NOT EXISTS (
    SELECT 1 FROM ratings x
    WHERE x.user_id = r.user_id AND x.item_id = s.item_id)
),
topn AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id, item_id ORDER BY sim DESC, neighbor_item ASC) AS nrank
    FROM cand
  ) WHERE nrank <= {k_neighbors}
)
SELECT user_id, item_id, score, CAST(rk AS INTEGER) AS rank FROM (
  SELECT user_id, item_id, score,
         row_number() OVER (
           PARTITION BY user_id ORDER BY score DESC, item_id ASC) AS rk
  FROM (
    SELECT user_id, item_id,
           round(sum(sim * r_u) / sum(abs(sim)), 6) AS score
    FROM topn
    GROUP BY 1, 2
    HAVING sum(abs(sim)) <> 0
  )
) WHERE rk <= {k_items}
""".strip()


# hybrid: blend the two top-k lists (children return CHILD_K items each),
# max-normalize per user, weight 0.6/0.4, sum per item, re-rank
# (reference HybridRecommenderTopK.scala:69-79,116-120).
def _hybrid_sql(
    kernel: str, prefilter: int, k_neighbors: int, child_k: int, k_items: int
) -> str:
    user_sql = _user_topk_sql(kernel, prefilter, k_neighbors, child_k)
    item_sql = _item_topk_sql(kernel, prefilter, k_neighbors, child_k)
    return f"""
WITH u_rec AS ({user_sql}),
i_rec AS ({item_sql}),
u_norm AS (
  SELECT user_id, item_id,
         0.6 * score / max(score) OVER (PARTITION BY user_id) AS wscore
  FROM u_rec
),
i_norm AS (
  SELECT user_id, item_id,
         0.4 * score / max(score) OVER (PARTITION BY user_id) AS wscore
  FROM i_rec
),
blended AS (
  SELECT user_id, item_id, round(sum(wscore), 6) AS score
  FROM (SELECT * FROM u_norm UNION ALL SELECT * FROM i_norm)
  GROUP BY 1, 2
)
SELECT user_id, item_id, score, CAST(rk AS INTEGER) AS rank FROM (
  SELECT user_id, item_id, score,
         row_number() OVER (
           PARTITION BY user_id ORDER BY score DESC, item_id ASC) AS rk
  FROM blended
) WHERE rk <= {k_items}
""".strip()


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------

PREFILTER = 50
K_NEIGHBORS = 10
K_ITEMS = 5
CHILD_K = 20
MIN_CO = 5


@register("user_sim_cosine", oracle=_pair_query_sql("user", "cosine", MIN_CO))
def user_sim_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 cosine over full rating vectors, as a co-rated self-join
    (reference similarity/CosineSimilarity.scala:24-33)."""
    return _pair_query(spark, sf_dir, "user", "cosine")


@register("user_sim_pearson", oracle=_pair_query_sql("user", "pearson", MIN_CO))
def user_sim_pearson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 Pearson with the reference's full-array means quirk
    (similarity/PearsonSimilarity.scala:24-37): means divide by the
    total item count N, zeros included."""
    return _pair_query(spark, sf_dir, "user", "pearson")


@register("item_sim_jaccard", oracle=_pair_query_sql("item", "jaccard", MIN_CO))
def item_sim_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 Jaccard over rater sets (similarity/JaccardSimilarity.scala:22-29,
    set form)."""
    return _pair_query(spark, sf_dir, "item", "jaccard")


@register("item_sim_euclidean", oracle=_pair_query_sql("item", "euclidean", MIN_CO))
def item_sim_euclidean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 inverted Euclidean 1/(√Σ(a−b)²+1)
    (similarity/EuclideanSimilarity.scala:24-28)."""
    return _pair_query(spark, sf_dir, "item", "euclidean")


def _pair_query(
    spark: SparkSession, sf_dir: str, axis: str, kernel: str
) -> DataFrame:
    ratings = ratings_from_sales(spark, sf_dir)
    sims = pairwise_similarity(
        ratings, kernel=kernel, axis=axis, directed=False, with_co=True
    )
    a, b = f"{axis}_a", f"{axis}_b"
    # 4 dp output: these queries list ~10⁶ pairs, and cross-engine float
    # noise (worst for the cancelling Pearson numerator, ~1e-12) must
    # stay far from the rounding bucket for the value-hash to be stable
    return (
        sims.where(F.col("co") >= MIN_CO)
        .select(a, b, F.round(F.round("sim", 7), 4).alias("sim"), "co")
    )


@register(
    "user_topk_cosine",
    bench=True,
    oracle=_user_topk_sql("cosine", PREFILTER, K_NEIGHBORS, K_ITEMS),
)
def user_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: top-5 recommendations for EVERY user via user k-NN
    (reference M3, UserBasedTopKRecommender.scala:40-91) as one
    distributed plan."""
    return user_based_topk(
        ratings_from_sales(spark, sf_dir),
        k_neighbors=K_NEIGHBORS,
        k_items=K_ITEMS,
        kernel="cosine",
        prefilter_neighbors=PREFILTER,
    )


@register(
    "item_topk_cosine",
    bench=True,
    oracle=_item_topk_sql("cosine", PREFILTER, K_NEIGHBORS, K_ITEMS),
)
def item_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 via item k-NN (reference M5, ItemBasedTopKRecommender
    .scala:44-94); per-item neighbor lists pre-pruned to the standard
    item-CF top-N model shape."""
    return item_based_topk(
        ratings_from_sales(spark, sf_dir),
        k_neighbors=K_NEIGHBORS,
        k_items=K_ITEMS,
        kernel="cosine",
        prefilter_neighbors=PREFILTER,
    )


@register(
    "hybrid_topk",
    bench=True,
    oracle=_hybrid_sql("cosine", PREFILTER, K_NEIGHBORS, CHILD_K, K_ITEMS),
)
def hybrid_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 weighted hybrid: max-normalized 0.6·user + 0.4·item blend
    (HybridRecommenderTopK.scala:69-79,116-120)."""
    ratings = ratings_from_sales(spark, sf_dir)
    u = user_based_topk(
        ratings, K_NEIGHBORS, CHILD_K, "cosine", prefilter_neighbors=PREFILTER
    )
    i = item_based_topk(
        ratings, K_NEIGHBORS, CHILD_K, "cosine", prefilter_neighbors=PREFILTER
    )
    return hybrid_topk(u, i, weight_a=0.6, weight_b=0.4, k_items=K_ITEMS)


@register(
    "rating_stats_per_user",
    oracle=f"""
WITH {RATINGS_CTE}
SELECT user_id,
       count(*) AS n_items,
       round(avg(rating), 6) AS mean_rating,
       round(sum(rating * rating), 6) AS sumsq
FROM ratings GROUP BY user_id
""",
)
def rating_stats_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/M1: the per-user stats that replace the reference's dense
    matrix materialization (BaseRecommender.scala:87-132)."""
    r = ratings_from_sales(spark, sf_dir)
    return r.groupBy("user_id").agg(
        F.count("*").alias("n_items"),
        F.round(F.avg("rating"), 6).alias("mean_rating"),
        F.round(F.sum(F.col("rating") * F.col("rating")), 6).alias("sumsq"),
    )

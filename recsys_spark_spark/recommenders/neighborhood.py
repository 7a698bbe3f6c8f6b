"""User-based and item-based neighborhood CF, all-users-at-once.

The reference scores ONE user per call with single-threaded driver
loops over a dense matrix (UserBasedTopKRecommender.scala:40-91,
ItemBasedTopKRecommender.scala:44-94 — O(users·items·veclen) per user,
model shipped inside every task closure, Main.scala:96-111).  Here each
recommender is ONE distributed plan for every user simultaneously:

    co-rated self-join sims  →  candidate join  →  anti-join rated
    →  per-(user,item) neighbor window rank ≤ k  →  aggregate score
    →  per-user item window rank ≤ K

Semantics preserved from the reference (cited):
- neighbors are selected PER CANDIDATE ITEM among the entities that
  actually rated it (UserBasedRatingRecommender.scala:34-53 filters
  raters before ranking);
- user-based prediction is the mean-centered weighted average
  ``mean_u + Σ sim·(r_n − mean_n) / Σ sim``
  (UserBasedRatingRecommender.scala:62-77); means are over *rated*
  entries only (the filter(_>0) at :41,67);
- item-based prediction is the plain weighted average
  ``Σ sim·r / Σ |sim|`` (ItemBasedRatingRecommender.scala:52-72; the
  reference folds the denominator with reduce(abs+abs), which equals
  Σ|sim| for ≥2 neighbors — we use Σ|sim| and document the 1-element
  quirk divergence);
- ties rank by ascending id (the reference's stable sort leaves ties in
  ascending candidate order, SURVEY §2.6).

Scores are rounded (7 dp for sims = SIM_ROUND, 6 dp for final scores)
BEFORE ranking so that rank decisions are stable across engines —
last-ulp float noise must not flip a top-k boundary when results are
hash-compared against a SQL oracle.

Scale notes: every stage is a key-partitioned shuffle Catalyst can
plan; the only quadratic term is the co-rated pair join, capped via
``max_raters_per_item`` (hot-item cutoff) or replaced by LSH
(operators/knn.py) above ~10⁸ pair rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import qround
from ..functions.similarity import pairwise_similarity

# Similarities are rounded to 7 dp BEFORE any ranking: cross-engine
# float noise (~1e-15) then flips a rank boundary only when two sims
# differ by <1e-7 AND straddle a rounding edge (~1e-8 per comparison);
# values that round equal tie-break deterministically by id.
SIM_ROUND = 7
SCORE_ROUND = 6


def _materialize(model: DataFrame) -> DataFrame:
    """Eagerly compute a cached neighbor model (cheap: O(entities·N) rows).

    ``cache()`` only *registers* the plan — blocks become reusable when
    first computed.  A single action that composes TWO models (the
    hybrid blend) would otherwise execute both quadratic pair joins
    from scratch inside one job with zero reuse (measured 58-98 s vs
    ~9+12 s for the children alone).  Forcing materialization here
    makes every subsequent action — the other hybrid child, standalone
    top-K, ranking eval — a cache read."""
    model.count()
    return model


def _user_means(ratings: DataFrame) -> DataFrame:
    """Per-user mean over *rated* entries (UserBasedRating...scala:41-45)."""
    return ratings.groupBy("user_id").agg(F.avg("rating").alias("mean_r"))


#: depth of the shared per-user rank cache — must cover the deepest
#: k any consumer of a shared scored DF requests (the hybrid blend's
#: CHILD_K; plans/recsys.py asserts CHILD_K <= RANK_CACHE_K)
RANK_CACHE_K = 20


def _rank_items(
    scored: DataFrame, k_items: int, share: bool = False
) -> DataFrame:
    """Per-user top-k by (score desc, item_id asc).

    ``share=True`` (the shared-model paths): the window runs ONCE at
    RANK_CACHE_K depth and is cached by plan identity, so the hybrid
    blend (k=20) and the standalone top-K children (k=5) all read the
    same O(users·20)-row ranked artifact instead of each re-sorting
    the full multi-million-row scored relation — the rank filter is
    then a cheap cache-read ``rank <= k``.  row_number over the same
    ordering is prefix-stable, so filtering the deeper ranking is
    exactly the shallower one.

    This ranked relation is the ONLY cache level on the scored path
    since r14: the pre-rank ``scored`` relation used to be cached too
    (2 × ~550 MiB storage at sf0.1 for the two hybrid axes), but every
    consumer reads it exactly once — through this window — so the
    extra cache bought no reuse and its storage squeezed execution
    memory enough to push the axis sorts into multi-GB spills on a
    contended host (guide §5: cache only what is reused; measured in
    OPTIMIZATION_r14.md)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("score"), F.asc("item_id"))
    if share and k_items <= RANK_CACHE_K:
        ranked = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= RANK_CACHE_K)
            .select("user_id", "item_id", "score", "rank")
            .cache()
        )
        return ranked.where(F.col("rank") <= k_items)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_items)
        .select("user_id", "item_id", "score", "rank")
    )


def _axis_sims(
    ratings: DataFrame,
    kernel: str,
    axis: str,
    n_cols: int | None,
    max_raters_per_item: int | None,
    use_lsh_candidates: bool,
) -> DataFrame:
    """Directed pair similarities for one CF axis — the exact co-rated
    self-join by default, or sign-LSH candidate generation with exact
    rerank when ``use_lsh_candidates`` (the extreme-scale switch: same
    similarity VALUES for every emitted pair, recall < 1 on the pair
    SET; see operators/cf_lsh.py and tests/test_cf_lsh.py)."""
    if use_lsh_candidates:
        from ..operators.cf_lsh import lsh_pairwise_similarity

        return lsh_pairwise_similarity(
            ratings,
            kernel=kernel,
            axis=axis,
            n_cols=n_cols,
            directed=True,
            max_raters_per_item=max_raters_per_item,
        )
    return pairwise_similarity(
        ratings,
        kernel=kernel,
        axis=axis,
        n_cols=n_cols,
        directed=True,
        max_raters_per_item=max_raters_per_item,
    )


def user_based_scored(
    ratings: DataFrame,
    k_neighbors: int = 25,
    kernel: str = "cosine",
    n_cols: int | None = None,
    max_raters_per_item: int | None = None,
    prefilter_neighbors: int | None = None,
    materialize: bool = True,
    use_lsh_candidates: bool = False,
) -> DataFrame:
    """Pre-rank scored candidates ``(user_id, item_id, score)`` for
    user k-NN — everything in :func:`user_based_topk` except the final
    per-user rank filter.  NOT cached (r14): sharing happens one level
    up, at the RANK_CACHE_K ranked relation (see _rank_items) — every
    consumer of this relation reads it exactly once, through that
    window.  ``materialize`` is kept for API compatibility; the eager
    materialization now happens on the ranked cache in the *_topk
    wrappers."""
    sims = _axis_sims(
        ratings,
        kernel=kernel,
        axis="user",
        n_cols=n_cols,
        max_raters_per_item=max_raters_per_item,
        use_lsh_candidates=use_lsh_candidates,
    ).select(
        F.col("user_a").alias("user_id"),
        F.col("user_b").alias("neighbor"),
        qround("sim", SIM_ROUND).alias("sim"),
    )

    if prefilter_neighbors is not None:
        wp = Window.partitionBy("user_id").orderBy(F.desc("sim"), F.asc("neighbor"))
        sims = (
            sims.withColumn("prn", F.row_number().over(wp))
            .where(F.col("prn") <= prefilter_neighbors)
            .drop("prn")
            # the pruned neighbor list IS the fitted k-NN model —
            # O(users·N) rows.  cache() registers by analyzed plan, so
            # every query in the session that builds the same model
            # (standalone top-K, the hybrid child, ranking eval) reuses
            # one materialization of the quadratic pair join instead of
            # re-running it
            .cache()
        )

    neigh_r = ratings.select(
        F.col("user_id").alias("neighbor"),
        "item_id",
        F.col("rating").alias("r_n"),
    )
    means = _user_means(ratings)
    n_means = means.select(
        F.col("user_id").alias("neighbor"), F.col("mean_r").alias("mean_n")
    )
    # candidate (user, item): some neighbor rated it...  The neighbor
    # MEAN is attached here, in the same join stage, NOT after the
    # top-k window: the candidate join leaves the O(model·ratings)
    # relation hash-partitioned on `neighbor`, so this second
    # neighbor-keyed join reuses that partitioning (only the O(users)
    # means relation shuffles); joining after the window — which is
    # (user,item)-partitioned — would re-exchange the full candidate
    # relation by neighbor, a third full-size shuffle (measured ~25M
    # rows at sf0.1, the single biggest cost in the axis build).
    cand = sims.join(neigh_r, "neighbor").join(n_means, "neighbor")
    # project r_n − mean_n NOW (guide §2.3 "project before the
    # exchange"): only the difference is ever read downstream, and the
    # candidate relation crosses an exchange and two window sorts —
    # one double instead of two is ~8 B × ~26M rows less to shuffle
    # and sort.  Exact: the subtraction happens per row either way.
    cand = cand.select(
        "user_id",
        "item_id",
        "neighbor",
        "sim",
        (F.col("r_n") - F.col("mean_n")).alias("rc"),
    )
    # ...and the user did not (anti-join replaces the reference's
    # filter(_._1 == 0) unrated scan, UserBasedTopKRecommender.scala:78)
    cand = cand.join(
        ratings.select("user_id", "item_id"), ["user_id", "item_id"], "left_anti"
    )

    w = Window.partitionBy("user_id", "item_id").orderBy(
        F.desc("sim"), F.asc("neighbor")
    )
    top = cand.withColumn("nrank", F.row_number().over(w)).where(
        F.col("nrank") <= k_neighbors
    )

    # r15: the neighbor aggregation is WINDOW sums over the same
    # (user_id, item_id) partitioning instead of a groupBy.  The input
    # is already exchanged+sorted for the nrank window and the group
    # count ≈ the row count (~24M groups from ~26M rows at sf0.1), so
    # the groupBy planned a fused partial+final HashAggregate pair
    # that built two ~24M-entry hash maps for ~0% reduction (profiled:
    # ~110 task-s of aggregation build per axis, and their memory
    # squeezed the adjacent rank-window sort into multi-GB spills).
    # The unbounded-frame window reuses the existing partitioning and
    # order — no exchange, no sort, no hash map; nrank == 1 then keeps
    # exactly one row per group.  Values identical up to float sum
    # order, absorbed by the SCORE_ROUND rounding (the same tolerance
    # class the DuckDB oracle comparison already rides on).
    wg = Window.partitionBy("user_id", "item_id")
    scored = (
        # both sums in ONE select → one Window operator (two chained
        # withColumn calls planned two Window passes over the relation)
        top.select(
            "*",
            F.sum("sim").over(wg).alias("sim_total"),
            F.sum(F.col("sim") * F.col("rc")).over(wg).alias("_num"),
        )
        .where(F.col("nrank") == 1)
        .where(F.col("sim_total") != 0)
        .join(means, "user_id")
        .select(
            "user_id",
            "item_id",
            qround(
                F.col("mean_r") + F.col("_num") / F.col("sim_total"),
                SCORE_ROUND,
            ).alias("score"),
        )
    )
    del materialize  # see docstring: materialization moved to the ranked cache
    return scored


def user_based_topk(
    ratings: DataFrame,
    k_neighbors: int = 25,
    k_items: int = 5,
    kernel: str = "cosine",
    n_cols: int | None = None,
    max_raters_per_item: int | None = None,
    prefilter_neighbors: int | None = None,
    materialize: bool = True,
    use_lsh_candidates: bool = False,
) -> DataFrame:
    """Top-K unrated items per user via user k-NN (reference M3).

    Returns ``(user_id, item_id, score, rank)`` for every user.

    ``prefilter_neighbors``: keep only each user's N globally
    most-similar neighbors before the candidate join.  The reference
    ranks neighbors per candidate item over ALL raters
    (UserBasedRatingRecommender.scala:34-53); pre-pruning bounds the
    candidate explosion to O(users·N·ratings-per-neighbor) — the knob
    that keeps this plan feasible at 100 TB.  Exact reference semantics
    = ``prefilter_neighbors=None``.

    ``materialize=False`` builds the plan without running any eager
    Spark job (see _share_scored).

    ``use_lsh_candidates=True`` swaps the co-rated pair self-join for
    sign-LSH candidate generation with exact rerank — the
    extreme-scale switch (see _axis_sims / operators/cf_lsh.py).
    """
    scored = user_based_scored(
        ratings,
        k_neighbors=k_neighbors,
        kernel=kernel,
        n_cols=n_cols,
        max_raters_per_item=max_raters_per_item,
        prefilter_neighbors=prefilter_neighbors,
        materialize=materialize,
        use_lsh_candidates=use_lsh_candidates,
    )
    share = prefilter_neighbors is not None
    out = _rank_items(scored, k_items, share=share)
    if share and materialize:
        _materialize(out)  # fills the RANK_CACHE_K ranked cache
    return out


def item_based_scored(
    ratings: DataFrame,
    k_neighbors: int = 25,
    kernel: str = "cosine",
    n_cols: int | None = None,
    max_raters_per_item: int | None = None,
    prefilter_neighbors: int | None = None,
    materialize: bool = True,
    use_lsh_candidates: bool = False,
) -> DataFrame:
    """Pre-rank scored candidates for item k-NN — :func:`item_based_topk`
    minus the final rank filter (see _share_scored)."""
    sims = _axis_sims(
        ratings,
        kernel=kernel,
        axis="item",
        n_cols=n_cols,
        max_raters_per_item=max_raters_per_item,
        use_lsh_candidates=use_lsh_candidates,
    ).select(
        F.col("item_a").alias("item_id"),
        F.col("item_b").alias("neighbor_item"),
        qround("sim", SIM_ROUND).alias("sim"),
    )
    return scored_from_item_sims(
        sims, ratings, k_neighbors, prefilter_neighbors, materialize
    )


def item_based_topk(
    ratings: DataFrame,
    k_neighbors: int = 25,
    k_items: int = 5,
    kernel: str = "cosine",
    n_cols: int | None = None,
    max_raters_per_item: int | None = None,
    prefilter_neighbors: int | None = None,
    materialize: bool = True,
    use_lsh_candidates: bool = False,
) -> DataFrame:
    """Top-K unrated items per user via item k-NN (reference M5).

    For each unrated candidate item, its neighbors are the k most
    similar items *among the items the user rated*
    (ItemBasedTopKRecommender.scala:44-94).

    ``use_lsh_candidates``: see :func:`user_based_topk`.
    """
    scored = item_based_scored(
        ratings,
        k_neighbors=k_neighbors,
        kernel=kernel,
        n_cols=n_cols,
        max_raters_per_item=max_raters_per_item,
        prefilter_neighbors=prefilter_neighbors,
        materialize=materialize,
        use_lsh_candidates=use_lsh_candidates,
    )
    share = prefilter_neighbors is not None
    out = _rank_items(scored, k_items, share=share)
    if share and materialize:
        _materialize(out)  # fills the RANK_CACHE_K ranked cache
    return out


def scored_from_item_sims(
    sims: DataFrame,
    ratings: DataFrame,
    k_neighbors: int,
    prefilter_neighbors: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Pre-rank scored candidates ``(user_id, item_id, score)`` from a
    directed item-similarity DataFrame — :func:`topk_from_item_sims`
    minus the final per-user rank filter.  NOT cached since r14 (see
    user_based_scored: sharing lives at the ranked cache)."""
    if prefilter_neighbors is not None:
        # the classic item-CF model shape: each item keeps its N most
        # similar items; bounds the candidate join at scale
        wp = Window.partitionBy("item_id").orderBy(
            F.desc("sim"), F.asc("neighbor_item")
        )
        sims = (
            sims.withColumn("prn", F.row_number().over(wp))
            .where(F.col("prn") <= prefilter_neighbors)
            .drop("prn")
            # cached for the same plan-identity reuse as the user-axis
            # model (see user_based_scored): item top-K, the hybrid
            # child, and content-based top-K each rebuild this exact
            # O(items·N)-row model
            .cache()
        )

    user_r = ratings.select(
        "user_id", F.col("item_id").alias("neighbor_item"), F.col("rating").alias("r_u")
    )
    # candidate (user, item): the user rated a similar item...
    cand = sims.join(user_r, "neighbor_item")
    # ...and has not rated the candidate itself
    cand = cand.join(
        ratings.select("user_id", "item_id"), ["user_id", "item_id"], "left_anti"
    )

    w = Window.partitionBy("user_id", "item_id").orderBy(
        F.desc("sim"), F.asc("neighbor_item")
    )
    top = cand.withColumn("nrank", F.row_number().over(w)).where(
        F.col("nrank") <= k_neighbors
    )

    # window sums instead of groupBy — same rationale as
    # user_based_scored (r15): groups ≈ rows, so the fused
    # partial+final HashAggregate pair built huge hash maps for ~0%
    # reduction; the unbounded-frame window reuses the nrank window's
    # exchange and sort outright
    wg = Window.partitionBy("user_id", "item_id")
    scored = (
        top.select(
            "*",
            F.sum(F.col("sim") * F.col("r_u")).over(wg).alias("num"),
            F.sum(F.abs("sim")).over(wg).alias("den"),
        )
        .where(F.col("nrank") == 1)
        .where(F.col("den") != 0)
        .select(
            "user_id",
            "item_id",
            qround(F.col("num") / F.col("den"), SCORE_ROUND).alias("score"),
        )
    )
    del materialize  # see user_based_scored: moved to the ranked cache
    return scored


def topk_from_item_sims(
    sims: DataFrame,
    ratings: DataFrame,
    k_neighbors: int,
    k_items: int,
    prefilter_neighbors: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Item-neighbor scoring core: top-K per user from a directed
    item-similarity DataFrame ``(item_id, neighbor_item, sim)``.

    Shared by item-based CF (M5, rating-space sims) and content-based
    (M8, feature-space sims) — the reference implements these twice
    with identical scoring (ItemBasedTopKRecommender.scala:62-70,
    ContentBasedTopKRecommender.scala:71-79: Σ sim·r / Σ|sim|).
    """
    scored = scored_from_item_sims(
        sims, ratings, k_neighbors, prefilter_neighbors, materialize
    )
    share = prefilter_neighbors is not None
    out = _rank_items(scored, k_items, share=share)
    if share and materialize:
        _materialize(out)  # fills the RANK_CACHE_K ranked cache
    return out


def predict_user_based(
    ratings: DataFrame,
    pairs: DataFrame,
    k_neighbors: int = 25,
    kernel: str = "cosine",
    n_cols: int | None = None,
    max_raters_per_item: int | None = None,
) -> DataFrame:
    """Predict ratings for explicit (user_id, item_id) pairs (reference M2).

    ``pred = mean_u + Σ sim·(r_n − mean_n) / Σ sim`` over the k most
    similar users who rated the item
    (UserBasedRatingRecommender.scala:34-77).
    Returns ``(user_id, item_id, prediction)``.

    ``max_raters_per_item`` is the same hot-key cutoff the top-K path
    carries (see plans/recsys.py::MAX_RATERS_PER_ITEM) — without it the
    prediction family keeps the uncapped quadratic pair join the top-K
    family already guards against.
    """
    sims = pairwise_similarity(
        ratings,
        kernel=kernel,
        axis="user",
        n_cols=n_cols,
        directed=True,
        max_raters_per_item=max_raters_per_item,
    ).select(
        F.col("user_a").alias("user_id"),
        F.col("user_b").alias("neighbor"),
        qround("sim", SIM_ROUND).alias("sim"),
    )
    neigh_r = ratings.select(
        F.col("user_id").alias("neighbor"), "item_id", F.col("rating").alias("r_n")
    )
    # JOIN ORDER MATTERS (r11, measured): pairs ⋈ sims first builds
    # |pairs| × sims-per-user candidates — sims-per-user grows with
    # corpus density (the quadratic co-rating regime), and the shape
    # measured >20x superlinear from sf0.01 to sf0.1 (28 s → >560 s).
    # Joining the RATERS OF THE ITEM first bounds candidates at
    # |pairs| × raters-per-item (a data-model constant under the
    # max_raters_per_item cap); the sims join then lands on BOTH keys
    # (user, neighbor) — selective, never expanding.  Inner joins
    # commute, so the candidate SET (neighbors who rated the item,
    # with a sim to the user) is identical.
    cand = pairs.join(neigh_r, "item_id").join(sims, ["user_id", "neighbor"])
    w = Window.partitionBy("user_id", "item_id").orderBy(
        F.desc("sim"), F.asc("neighbor")
    )
    top = cand.withColumn("nrank", F.row_number().over(w)).where(
        F.col("nrank") <= k_neighbors
    )
    means = _user_means(ratings)
    n_means = means.select(
        F.col("user_id").alias("neighbor"), F.col("mean_r").alias("mean_n")
    )
    return (
        top.join(n_means, "neighbor")
        .groupBy("user_id", "item_id")
        .agg(
            (
                F.sum(F.col("sim") * (F.col("r_n") - F.col("mean_n")))
                / F.sum("sim")
            ).alias("delta"),
            F.sum("sim").alias("sim_total"),
        )
        .where(F.col("sim_total") != 0)
        .join(means, "user_id")
        .select(
            "user_id",
            "item_id",
            qround(F.col("mean_r") + F.col("delta"), SCORE_ROUND).alias(
                "prediction"
            ),
        )
    )


def predict_item_based(
    ratings: DataFrame,
    pairs: DataFrame,
    k_neighbors: int = 25,
    kernel: str = "cosine",
    n_cols: int | None = None,
    max_raters_per_item: int | None = None,
) -> DataFrame:
    """Predict ratings for explicit pairs via item k-NN (reference M4).

    ``pred = Σ sim·r_u / Σ |sim|`` over the k items most similar to the
    target among the user's rated items
    (ItemBasedRatingRecommender.scala:36-72).
    ``max_raters_per_item``: same skew guard as predict_user_based.
    """
    sims = pairwise_similarity(
        ratings,
        kernel=kernel,
        axis="item",
        n_cols=n_cols,
        directed=True,
        max_raters_per_item=max_raters_per_item,
    ).select(
        F.col("item_a").alias("item_id"),
        F.col("item_b").alias("neighbor_item"),
        qround("sim", SIM_ROUND).alias("sim"),
    )
    return predict_from_item_sims(sims, ratings, pairs, k_neighbors)


def predict_from_item_sims(
    sims: DataFrame,
    ratings: DataFrame,
    pairs: DataFrame,
    k_neighbors: int = 25,
) -> DataFrame:
    """Rating prediction from a directed item-sims DataFrame — shared
    core of M4 (CF sims) and M7 (content sims):
    ``Σ sim·r / Σ |sim|`` over the k nearest rated items."""
    user_r = ratings.select(
        "user_id",
        F.col("item_id").alias("neighbor_item"),
        F.col("rating").alias("r_u"),
    )
    # same join-order lesson as predict_user_based (r11): the USER'S
    # RATED ITEMS first (|pairs| × items-per-user, a data-model
    # bound), then sims on BOTH keys — never |pairs| × sims-per-item
    cand = pairs.join(user_r, "user_id").join(
        sims, ["item_id", "neighbor_item"]
    )
    w = Window.partitionBy("user_id", "item_id").orderBy(
        F.desc("sim"), F.asc("neighbor_item")
    )
    top = cand.withColumn("nrank", F.row_number().over(w)).where(
        F.col("nrank") <= k_neighbors
    )
    return (
        top.groupBy("user_id", "item_id")
        .agg(
            F.sum(F.col("sim") * F.col("r_u")).alias("num"),
            F.sum(F.abs("sim")).alias("den"),
        )
        .where(F.col("den") != 0)
        .select(
            "user_id",
            "item_id",
            qround(F.col("num") / F.col("den"), SCORE_ROUND).alias("prediction"),
        )
    )

"""LSH candidate pruning for the neighborhood-CF pair join
(the documented "extreme-scale switch", PERF.md).

The exact CF axis (functions/similarity.py::pairwise_similarity)
enumerates every co-rated pair via a self-join on the shared key —
O(Σ_key n_key²) pair rows.  The hot-key cap bounds any single key, but
at 100 TB the aggregate pair relation is still the engine's largest
irreducible exchange (~1 GB per axis at sf0.1, stage-profiled).  This
module replaces ENUMERATION with sign-LSH candidate GENERATION:

    ratings ──► per-entity band signatures (sparse, never densified)
            ──► band-bucket self-join → candidate pairs  (≪ all pairs)
            ──► EXACT kernel similarity on candidates only

Only candidate generation is approximate — every emitted similarity is
the exact kernel value over the true co-rated stats, so downstream
scoring (neighbor windows, weighted averages) is unchanged; the
approximation shows up solely as missing low-similarity pairs, i.e.
recall < 1 on the neighbor lists (measured ≥ 0.95 vs the exact axis at
sf0.01 in tests/test_cf_lsh.py).

Sign-LSH over a SPARSE long-format matrix (no dense vector ever):
- each key (the co-rating dimension: items for user-axis, users for
  item-axis) gets ``n_planes`` deterministic pseudo-random weights
  (operators/knn.py::plane_weight — md5-derived, engine-replayable);
- an entity's plane projection is ``Σ_keys r·w(p, key)`` — a single
  groupBy(ent) with ``n_planes`` partial-aggregable sums, so the
  signature pass is ONE map-side-combinable shuffle of
  O(entities × n_planes) partials, linear in the ratings;
- bits are banded exactly like the embedding ANN operator
  (knn.py::lsh_signatures): candidates agree on ALL bits of ≥1 band.

Exact pair stats WITHOUT the key self-join: each entity's ratings are
carried as a ``map<key, rating>``; for a candidate pair the co-rated
dot/count reduce to ``map_zip_with`` + ``aggregate`` — JVM higher-order
functions, no UDF, O(len_a + len_b) per CANDIDATE (not per co-rated
pair of the full matrix).

Cost model vs the exact axis: exact = O(Σ_key n_key²) pair rows through
two exchanges; LSH = O(ratings) signature pass + O(candidates·avg_len)
map zips.  The knob is ``band_width``: wider bands → fewer, purer
candidates (use 8–16 when the rating vectors are long and angularly
clustered, as all-positive rating data is); narrower → higher recall.

Reference parity: the reference has no counterpart — its similarity
scans are O(n²) driver loops (UserBasedTopKRecommender.scala:47-59);
this switch exists so the Spark engine can keep the same semantics
past the scale where even the capped exact join stops being feasible.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import with_kernel_column

N_PLANES = 128
BAND_WIDTH = 8

#: the rating relation cached by the last ``lsh_pairwise_similarity``
#: call (CACHE OWNERSHIP, same contract as recommenders/als.py:63-71:
#: the cache must outlive the returned lazy DataFrame, so the function
#: cannot unpersist it itself).  ``release_last_state()`` frees it once
#: the caller has materialized the sims.
_last_cached: list[DataFrame] = []


def release_last_state() -> None:
    """Unpersist the rating relation(s) cached by prior
    ``lsh_pairwise_similarity`` calls.  Call after the returned sims
    DataFrame has been materialized (collected / written / cached
    itself); the sims plan re-computes the relation if executed again
    afterwards."""
    while _last_cached:
        _last_cached.pop().unpersist()


def _key_plane_weights(
    keys: DataFrame, n_planes: int = N_PLANES
) -> DataFrame:
    """``(key, wv array<double>)`` — the ``n_planes`` deterministic
    hyperplane weights of each co-rating key (same md5 family as
    operators/knn.py::plane_weight, indexed by the key VALUE instead
    of a dense dimension index, so the matrix is never densified).
    One narrow Arrow-batched map over the distinct keys — O(keys)."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    @pandas_udf(ArrayType(DoubleType()))
    def weights(s: pd.Series) -> pd.Series:
        out = []
        for key in s:
            ws = np.empty(n_planes, dtype=np.float64)
            for p in range(n_planes):
                h = int(
                    hashlib.md5(f"{p}_{key}".encode()).hexdigest()[:15], 16
                )
                ws[p] = (h % 2000001 - 1000000) / 1000000.0
            out.append(ws)
        return pd.Series(out)

    return keys.select(F.col("key"), weights(F.col("key")).alias("wv"))


def _band_sigs(
    r: DataFrame,
    n_planes: int = N_PLANES,
    band_width: int = BAND_WIDTH,
) -> DataFrame:
    """``(ent, band, sig)`` from long-format ``(ent, key, r)``.

    The plane projections are ``n_planes`` plain sums — partial
    aggregation (map-side combine) reduces the shuffle to
    O(entities × n_planes) regardless of ratings volume; the weight
    join is a key-keyed equi-join AQE can broadcast when the key
    vocabulary is small."""
    if n_planes % band_width != 0:
        raise ValueError("n_planes must be a multiple of band_width")
    n_bands = n_planes // band_width
    wkeys = _key_plane_weights(r.select("key").distinct(), n_planes)
    proj = (
        r.join(wkeys, "key")
        .groupBy("ent")
        .agg(
            *[
                F.sum(F.col("r") * F.col("wv")[p]).alias(f"_s{p}")
                for p in range(n_planes)
            ]
        )
    )
    bands = [
        F.concat(
            *[
                F.when(F.col(f"_s{b * band_width + i}") >= 0, "1").otherwise("0")
                for i in range(band_width)
            ]
        )
        for b in range(n_bands)
    ]
    return proj.select(
        "ent", F.posexplode(F.array(*bands)).alias("band", "sig")
    )


def lsh_candidate_pairs(
    r: DataFrame,
    n_planes: int = N_PLANES,
    band_width: int = BAND_WIDTH,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Undirected candidate pairs ``(ea, eb)`` with ``ea < eb`` —
    entities agreeing on all bits of at least one band.

    ``max_bucket`` drops degenerate buckets before the self-join (the
    same skew guard as knn.py::cosine_knn_lsh): a bucket holding a
    large fraction of all entities carries no discriminative signal
    and would reintroduce the quadratic blowup the switch exists to
    avoid."""
    sigs = _band_sigs(r, n_planes, band_width)
    if max_bucket is not None:
        sizes = sigs.groupBy("band", "sig").agg(F.count("*").alias("_bn"))
        sigs = (
            sigs.join(sizes, ["band", "sig"])
            .where(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    a = sigs.select("band", "sig", F.col("ent").alias("ea"))
    b = sigs.select("band", "sig", F.col("ent").alias("eb"))
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("ea") < F.col("eb"))
        .select("ea", "eb")
        .distinct()
    )


def lsh_pairwise_similarity(
    ratings: DataFrame,
    kernel: str = "cosine",
    axis: str = "user",
    n_cols: int | None = None,
    directed: bool = True,
    max_raters_per_item: int | None = None,
    n_planes: int = N_PLANES,
    band_width: int = BAND_WIDTH,
    max_bucket: int | None = 10_000,
    euclidean_fallback: bool = False,
) -> DataFrame:
    """Drop-in replacement for
    functions/similarity.py::pairwise_similarity with LSH candidate
    generation instead of the co-rated self-join (module docstring).

    Same output schema — ``(user_a, user_b, sim)`` /
    ``(item_a, item_b, sim)``, mirrored when ``directed`` — and the
    SAME similarity values for every emitted pair (exact kernel over
    the true co-rated stats; candidate pairs with zero co-rated keys
    are dropped, matching the exact path's co-rated-only contract).
    ``max_raters_per_item`` applies the identical hot-key cutoff to
    the rating relation first, so both paths score the same effective
    matrix."""
    if axis == "user":
        ent, key = "user_id", "item_id"
    elif axis == "item":
        ent, key = "item_id", "user_id"
    else:
        raise ValueError(f"axis must be 'user' or 'item', got {axis!r}")

    r = ratings.select(
        F.col(ent).alias("ent"),
        F.col(key).alias("key"),
        F.col("rating").alias("r"),
    )
    if max_raters_per_item is not None:
        hot = (
            r.groupBy("key")
            .agg(F.count("*").alias("_kn"))
            .where(F.col("_kn") > max_raters_per_item)
            .select("key")
        )
        r = r.join(F.broadcast(hot), "key", "left_anti")
    # duplicate (ent, key) rows would make map_from_entries below throw
    # DUPLICATE_MAP_KEY — sum them first, which DEFINES the effective
    # matrix as the duplicate-summed one (for the dot product this
    # matches the exact path: its per-key join contributes
    # Σᵢ Σⱼ rᵃᵢ·rᵇⱼ = (Σ rᵃ)(Σ rᵇ), the product of the summed entries);
    # a no-op single-pass pre-aggregation when (ent, key) is unique,
    # as rating data is
    r = r.groupBy("ent", "key").agg(F.sum("r").alias("r"))
    # the rating relation feeds the signature pass AND both sides of
    # the entity-profile join — cache; ownership documented on
    # release_last_state() (module top): caller frees via
    # release_last_state() after materializing the sims
    r = r.cache()
    _last_cached.append(r)

    cand = lsh_candidate_pairs(r, n_planes, band_width, max_bucket)

    # per-entity profile: rating map + the kernel scalars, one shuffle
    prof = r.groupBy("ent").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("key"), F.col("r")))
        ).alias("m"),
        F.sum("r").alias("sum_r"),
        F.sum(F.col("r") * F.col("r")).alias("sumsq_r"),
        F.count("*").alias("n_r"),
    )
    pa = prof.select(
        F.col("ent").alias("ea"),
        F.col("m").alias("ma"),
        F.col("sum_r").alias("sum_a"),
        F.col("sumsq_r").alias("sumsq_a"),
        F.col("n_r").alias("n_a"),
    )
    pb = prof.select(
        F.col("ent").alias("eb"),
        F.col("m").alias("mb"),
        F.col("sum_r").alias("sum_b"),
        F.col("sumsq_r").alias("sumsq_b"),
        F.col("n_r").alias("n_b"),
    )
    # co-rated dot/count per CANDIDATE pair — map_zip_with pairs the
    # two rating maps on their key union (null where one side misses),
    # all JVM higher-order functions
    zipped = F.map_zip_with("ma", "mb", lambda k, x, y: x * y)
    pairs = (
        cand.join(pa, "ea")
        .join(pb, "eb")
        .withColumn("_z", F.map_values(zipped))
        .select(
            "ea",
            "eb",
            "sum_a",
            "sumsq_a",
            "n_a",
            "sum_b",
            "sumsq_b",
            "n_b",
            F.aggregate(
                "_z", F.lit(0.0), lambda acc, v: acc + F.coalesce(v, F.lit(0.0))
            ).alias("dot"),
            F.size(F.filter("_z", lambda v: v.isNotNull())).cast("long").alias(
                "co"
            ),
        )
        .where(F.col("co") > 0)
    )

    if n_cols is not None:
        n_expr: Column = F.lit(float(n_cols))
    elif kernel == "pearson":
        n_df = ratings.select(
            F.countDistinct(key).cast("double").alias("_n_cols")
        )
        pairs = pairs.crossJoin(F.broadcast(n_df))
        n_expr = F.col("_n_cols")
    else:
        n_expr = F.lit(1.0)

    sims = with_kernel_column(pairs, kernel, n_expr)
    if euclidean_fallback and kernel != "euclidean":
        # K5 (mirrors pairwise_similarity): primary sim of exactly 0.0
        # falls back to inverted Euclidean.  Regime note: under LSH
        # candidates a zero-cosine pair rarely COLLIDES in the first
        # place, so the fallback's reachable set is recall-limited like
        # every other pair — callers whose corpora actually exercise
        # K5 (all-positive feature spaces never do) should stay exact.
        sq_dist = F.col("sumsq_a") + F.col("sumsq_b") - 2 * F.col("dot")
        euclid = 1.0 / (F.sqrt(F.greatest(sq_dist, F.lit(0.0))) + 1.0)
        sims = sims.withColumn(
            "sim", F.when(F.col("sim") == 0.0, euclid).otherwise(F.col("sim"))
        )
    sims = sims.select("ea", "eb", "sim")

    if directed:
        # one generator, not Union(X, mirror(X)) — same rationale as
        # pairwise_similarity (the union would execute the candidate
        # subtree twice; no ReusedExchange)
        def _s(x: str, y: str) -> Column:
            return F.struct(
                F.col(x).alias("ea"),
                F.col(y).alias("eb"),
                F.col("sim").alias("sim"),
            )

        sims = sims.select(
            F.explode(F.array(_s("ea", "eb"), _s("eb", "ea"))).alias("_p")
        ).select("_p.*")

    out_a, out_b = f"{axis}_a", f"{axis}_b"
    return sims.select(
        F.col("ea").alias(out_a), F.col("eb").alias(out_b), "sim"
    )

"""Golden recommender tests (SURVEY §5 item 2 / FIXTURES.md §A4): a
hand-sized rating fixture scored by an INDEPENDENT NumPy
implementation of the reference formulas (similarity/*.scala,
recommender/*.scala), compared against the engine's DataFrame plans.

The NumPy code follows the reference's math with the engine's
documented divergences (zero-co-rated pairs omitted; Σ|sim|
denominator; ordered-prefix AP) — the fixture is built so no pair has
zero co-rated items, keeping both implementations on the exact
reference semantics.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from recsys_spark_spark.functions.similarity import pairwise_similarity
from recsys_spark_spark.recommenders.hybrid import hybrid_topk
from recsys_spark_spark.recommenders.neighborhood import (
    item_based_topk,
    predict_user_based,
    user_based_topk,
)

# 5 users × 6 items; every user pair co-rates >= 1 item
RATINGS = [
    (1, 1, 5.0), (1, 2, 3.0), (1, 3, 4.0),
    (2, 1, 4.0), (2, 2, 2.0), (2, 4, 5.0),
    (3, 2, 4.0), (3, 3, 5.0), (3, 5, 3.0),
    (4, 1, 2.0), (4, 4, 4.0), (4, 5, 5.0), (4, 6, 3.0),
    (5, 2, 5.0), (5, 3, 2.0), (5, 6, 4.0),
]
N_USERS, N_ITEMS = 5, 6
K_NEIGHBORS, K_ITEMS = 2, 3


def _matrix():
    M = np.zeros((N_USERS, N_ITEMS))
    for u, i, r in RATINGS:
        M[u - 1, i - 1] = r
    return M


def _cosine(a, b):
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def _pearson(a, b):
    # reference quirk: means over the FULL array incl. zeros
    # (PearsonSimilarity.scala:24-37)
    am, bm = a - a.mean(), b - b.mean()
    return float(am @ bm / (np.linalg.norm(am) * np.linalg.norm(bm)))


def _numpy_user_sims(M, kernel):
    f = {"cosine": _cosine, "pearson": _pearson}[kernel]
    sims = {}
    for a in range(N_USERS):
        for b in range(N_USERS):
            if a != b and np.any((M[a] > 0) & (M[b] > 0)):
                sims[(a + 1, b + 1)] = round(f(M[a], M[b]), 7)
    return sims


def _numpy_user_topk(M, k_neighbors, k_items):
    """Engine/reference semantics: per candidate item, the k most
    similar raters; mean-centered weighted average; ties ascending id
    (UserBasedRatingRecommender.scala:34-77)."""
    sims = _numpy_user_sims(M, "cosine")
    means = {u: M[u - 1][M[u - 1] > 0].mean() for u in range(1, N_USERS + 1)}
    out = {}
    for u in range(1, N_USERS + 1):
        scored = []
        for it in range(1, N_ITEMS + 1):
            if M[u - 1, it - 1] > 0:
                continue
            raters = [
                v
                for v in range(1, N_USERS + 1)
                if v != u and M[v - 1, it - 1] > 0 and (u, v) in sims
            ]
            top = sorted(raters, key=lambda v: (-sims[(u, v)], v))[:k_neighbors]
            if not top:
                continue
            s = sum(sims[(u, v)] for v in top)
            if s == 0:
                continue
            delta = (
                sum(sims[(u, v)] * (M[v - 1, it - 1] - means[v]) for v in top) / s
            )
            scored.append((it, round(means[u] + delta, 6)))
        ranked = sorted(scored, key=lambda t: (-t[1], t[0]))[:k_items]
        out[u] = [(it, sc, rk + 1) for rk, (it, sc) in enumerate(ranked)]
    return out


def _numpy_item_topk(M, k_neighbors, k_items):
    """Σ sim·r / Σ|sim| over the k items most similar to the candidate
    among the user's rated items (ItemBasedTopKRecommender.scala:44-94)."""
    MT = M.T
    sims = {}
    for a in range(N_ITEMS):
        for b in range(N_ITEMS):
            if a != b and np.any((MT[a] > 0) & (MT[b] > 0)):
                sims[(a + 1, b + 1)] = round(_cosine(MT[a], MT[b]), 7)
    out = {}
    for u in range(1, N_USERS + 1):
        scored = []
        for it in range(1, N_ITEMS + 1):
            if M[u - 1, it - 1] > 0:
                continue
            rated = [
                j
                for j in range(1, N_ITEMS + 1)
                if M[u - 1, j - 1] > 0 and (it, j) in sims
            ]
            top = sorted(rated, key=lambda j: (-sims[(it, j)], j))[:k_neighbors]
            den = sum(abs(sims[(it, j)]) for j in top)
            if not top or den == 0:
                continue
            num = sum(sims[(it, j)] * M[u - 1, j - 1] for j in top)
            scored.append((it, round(num / den, 6)))
        ranked = sorted(scored, key=lambda t: (-t[1], t[0]))[:k_items]
        out[u] = [(it, sc, rk + 1) for rk, (it, sc) in enumerate(ranked)]
    return out


@pytest.fixture(scope="module")
def ratings_df(spark):
    return spark.createDataFrame(
        RATINGS, "user_id int, item_id int, rating double"
    )


@pytest.mark.parametrize("kernel", ["cosine", "pearson"])
def test_pairwise_similarity_matches_numpy(spark, ratings_df, kernel):
    got = {
        (r["user_a"], r["user_b"]): round(r["sim"], 7)
        for r in pairwise_similarity(ratings_df, kernel=kernel, axis="user").collect()
    }
    want = _numpy_user_sims(_matrix(), kernel)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1.5e-7), k


def test_user_topk_matches_numpy(spark, ratings_df):
    got = {}
    for r in user_based_topk(
        ratings_df, k_neighbors=K_NEIGHBORS, k_items=K_ITEMS
    ).collect():
        got.setdefault(r["user_id"], []).append(
            (r["item_id"], r["score"], r["rank"])
        )
    want = _numpy_user_topk(_matrix(), K_NEIGHBORS, K_ITEMS)
    for u in want:
        got_u = sorted(got.get(u, []), key=lambda t: t[2])
        assert len(got_u) == len(want[u]), f"user {u}"
        for (gi, gs, gr), (wi, ws, wr) in zip(got_u, want[u]):
            assert (gi, gr) == (wi, wr), f"user {u}"
            assert gs == pytest.approx(ws, abs=2e-6), f"user {u} item {gi}"


def test_item_topk_matches_numpy(spark, ratings_df):
    got = {}
    for r in item_based_topk(
        ratings_df, k_neighbors=K_NEIGHBORS, k_items=K_ITEMS
    ).collect():
        got.setdefault(r["user_id"], []).append(
            (r["item_id"], r["score"], r["rank"])
        )
    want = _numpy_item_topk(_matrix(), K_NEIGHBORS, K_ITEMS)
    for u in want:
        got_u = sorted(got.get(u, []), key=lambda t: t[2])
        assert len(got_u) == len(want[u]), f"user {u}"
        for (gi, gs, gr), (wi, ws, wr) in zip(got_u, want[u]):
            assert (gi, gr) == (wi, wr), f"user {u}"
            assert gs == pytest.approx(ws, abs=2e-6), f"user {u} item {gi}"


def test_hybrid_matches_numpy_blend(spark, ratings_df):
    """Hybrid = 0.6·user + 0.4·item after per-user max normalization
    (HybridRecommenderTopK.scala:69-79,116-120), recomputed in NumPy
    from the two golden child rankings."""
    u_rec = _numpy_user_topk(_matrix(), K_NEIGHBORS, K_ITEMS)
    i_rec = _numpy_item_topk(_matrix(), K_NEIGHBORS, K_ITEMS)
    want = {}
    for u in range(1, N_USERS + 1):
        blended = {}
        for rec, wgt in ((u_rec, 0.6), (i_rec, 0.4)):
            rows = rec.get(u, [])
            if not rows:
                continue
            mx = max(s for _, s, _ in rows)
            for it, s, _ in rows:
                blended[it] = blended.get(it, 0.0) + wgt * s / mx
        ranked = sorted(blended.items(), key=lambda t: (-round(t[1], 6), t[0]))
        want[u] = [
            (it, round(s, 6), rk + 1) for rk, (it, s) in enumerate(ranked[:K_ITEMS])
        ]

    u_df = user_based_topk(ratings_df, K_NEIGHBORS, K_ITEMS)
    i_df = item_based_topk(ratings_df, K_NEIGHBORS, K_ITEMS)
    got = {}
    for r in hybrid_topk(u_df, i_df, 0.6, 0.4, K_ITEMS).collect():
        got.setdefault(r["user_id"], []).append(
            (r["item_id"], r["score"], r["rank"])
        )
    for u in want:
        got_u = sorted(got.get(u, []), key=lambda t: t[2])
        assert [(i, r) for i, _, r in got_u] == [(i, r) for i, _, r in want[u]]
        for (gi, gs, gr), (wi, ws, wr) in zip(got_u, want[u]):
            assert gs == pytest.approx(ws, abs=2e-6)


def test_predict_user_based_matches_numpy(spark, ratings_df):
    """M2 on explicit held-out pairs."""
    M = _matrix()
    sims = _numpy_user_sims(M, "cosine")
    means = {u: M[u - 1][M[u - 1] > 0].mean() for u in range(1, N_USERS + 1)}
    pairs = [(1, 4), (2, 3), (5, 1)]
    want = {}
    for u, it in pairs:
        raters = [
            v
            for v in range(1, N_USERS + 1)
            if v != u and M[v - 1, it - 1] > 0 and (u, v) in sims
        ]
        top = sorted(raters, key=lambda v: (-sims[(u, v)], v))[:K_NEIGHBORS]
        s = sum(sims[(u, v)] for v in top)
        if top and s != 0:
            delta = (
                sum(sims[(u, v)] * (M[v - 1, it - 1] - means[v]) for v in top) / s
            )
            want[(u, it)] = round(means[u] + delta, 6)
    pairs_df = spark.createDataFrame(pairs, "user_id int, item_id int")
    got = {
        (r["user_id"], r["item_id"]): r["prediction"]
        for r in predict_user_based(
            ratings_df, pairs_df, k_neighbors=K_NEIGHBORS
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)

"""PageRank operator: structural sanity on a hand-built graph +
mass conservation.  (Cross-engine parity of the registered
item_pagerank query runs in test_oracle_parity.)"""

from __future__ import annotations

import pytest

from recsys_spark_spark.operators.pagerank import corating_edges, pagerank


@pytest.fixture(scope="module")
def star_ranks(spark):
    # star: hub 0 <-> leaves 1..4 (both directions, w=1)
    rows = [(0, l, 1.0) for l in range(1, 5)] + [
        (l, 0, 1.0) for l in range(1, 5)
    ]
    edges = spark.createDataFrame(rows, "src long, dst long, w double")
    return {r["id"]: r["pr"] for r in pagerank(edges, iters=10).collect()}


def test_star_hub_dominates(star_ranks):
    hub, leaves = star_ranks[0], [star_ranks[i] for i in range(1, 5)]
    assert all(hub > lv for lv in leaves)
    assert len(set(round(lv, 9) for lv in leaves)) == 1, "leaves symmetric"


def test_mass_conserved(star_ranks):
    # no dangling nodes -> total rank mass stays 1 (up to the 7-dp
    # per-iteration quantization)
    assert abs(sum(star_ranks.values()) - 1.0) < 1e-5


def test_corating_edge_weights(spark):
    # users {10,11} both rate items {1,2} -> edge (1,2) weight 2, both
    # directions; user 12 adds item 3 co-rated with 1 only
    ratings = spark.createDataFrame(
        [
            (10, 1, 5.0),
            (10, 2, 3.0),
            (11, 1, 4.0),
            (11, 2, 2.0),
            (12, 1, 1.0),
            (12, 3, 1.0),
        ],
        "user_id long, item_id long, rating double",
    )
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in corating_edges(ratings).collect()
    }
    assert got == {
        (1, 2): 2.0,
        (2, 1): 2.0,
        (1, 3): 1.0,
        (3, 1): 1.0,
    }


def test_hot_user_cap_drops_user(spark):
    ratings = spark.createDataFrame(
        [(10, i, 1.0) for i in range(5)] + [(11, 0, 1.0), (11, 1, 1.0)],
        "user_id long, item_id long, rating double",
    )
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in corating_edges(ratings, max_items_per_user=3).collect()
    }
    # user 10 (5 items) is dropped; only user 11's pair remains
    assert got == {(0, 1): 1.0, (1, 0): 1.0}


def test_high_iteration_checkpoint_same_ranks_and_bounded_planning(spark):
    """iters > CHECKPOINT_AFTER_ITERS truncates lineage per round
    (localCheckpoint, the components.py pattern) — ranks must be
    IDENTICAL to the pure-lazy unrolled plan (checkpointing only moves
    where execution happens), and a 25-round run must complete without
    the exponentially nested plan re-analysis that motivated the guard."""
    import time

    from recsys_spark_spark.operators import pagerank as prmod

    rows = [(0, l, 1.0) for l in range(1, 5)] + [
        (l, 0, 1.0) for l in range(1, 5)
    ] + [(1, 2, 1.0), (2, 1, 1.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, w double")

    # equality check at 12 iters: default (checkpointed, 12 > 10) vs
    # forced-lazy via a raised threshold
    chk = {r["id"]: r["pr"] for r in prmod.pagerank(edges, iters=12).collect()}
    old = prmod.CHECKPOINT_AFTER_ITERS
    try:
        prmod.CHECKPOINT_AFTER_ITERS = 1000
        lazy = {
            r["id"]: r["pr"] for r in prmod.pagerank(edges, iters=12).collect()
        }
    finally:
        prmod.CHECKPOINT_AFTER_ITERS = old
    assert chk == lazy

    # 25-iteration stress: completes, conserves mass, converged ranks
    t0 = time.time()
    ranks = {r["id"]: r["pr"] for r in prmod.pagerank(edges, iters=25).collect()}
    elapsed = time.time() - t0
    assert abs(sum(ranks.values()) - 1.0) < 1e-5
    assert ranks[0] > ranks[3]  # hub still dominates a pure leaf
    assert elapsed < 120, f"25-iter run took {elapsed:.0f}s — lineage grew"


def test_triangle_stats_on_planted_graph(spark):
    """K4 plus a pendant: every K4 vertex sits in C(3,2)=3 triangles
    with clustering 1.0; the pendant has degree 1, zero triangles,
    clustering pinned 0.0; total distinct triangles = 4 (each counted
    once at its lowest-(degree,id) vertex — the orientation contract)."""
    from recsys_spark_spark.plans.graph import triangle_stats

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)]
    und = spark.createDataFrame(edges, "src long, dst long")
    out = {r["item_id"]: r for r in triangle_stats(und).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[5]["degree"] == 1 and out[5]["n_triangles"] == 0
    assert out[5]["clustering"] == 0.0
    for v in (2, 3, 4):
        assert out[v]["degree"] == 3 and out[v]["n_triangles"] == 3
        assert out[v]["clustering"] == 1.0
    # vertex 1 has the pendant: deg 4, still 3 triangles, cc = 6/12
    assert out[1]["degree"] == 4 and out[1]["n_triangles"] == 3
    assert out[1]["clustering"] == 0.5
    # global count: sum of per-node counts = 3 × distinct triangles
    assert sum(r["n_triangles"] for r in out.values()) == 3 * 4

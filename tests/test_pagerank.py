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

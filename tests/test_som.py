"""Batch SOM tests: determinism, grid topology, cluster validity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from recsys_spark_spark.recommenders.som import BatchSOM, dense_hash_features


def _clustered_points(spark, n_per=30, seed=7):
    """3 well-separated gaussian blobs in 8 dims."""
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[10.0] * 8, [-10.0] * 8, [10.0, -10.0] * 4]
    )
    rows = []
    for ci, c in enumerate(centers):
        pts = c + rng.normal(0, 0.5, size=(n_per, 8))
        for i, p in enumerate(pts):
            rows.append((ci * n_per + i, ci, [float(x) for x in p]))
    return spark.createDataFrame(
        rows, "id int, true_cluster int, features array<double>"
    )


def test_som_deterministic(spark):
    df = _clustered_points(spark)
    a = BatchSOM(2, 2, max_iter=5, seed=42).fit(df)
    b = BatchSOM(2, 2, max_iter=5, seed=42).fit(df)
    assert np.allclose(a.codebook_, b.codebook_)
    ra = sorted((r["id"], r["transaction_cluster"]) for r in a.transform(df).collect())
    rb = sorted((r["id"], r["transaction_cluster"]) for r in b.transform(df).collect())
    assert ra == rb


def test_som_separates_blobs(spark):
    """Well-separated blobs must map to internally-consistent units:
    every point of a blob shares its blob's majority unit."""
    df = _clustered_points(spark)
    som = BatchSOM(2, 2, max_iter=8, seed=42).fit(df)
    out = som.transform(df).collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r["true_cluster"], []).append(r["transaction_cluster"])
    units = set()
    for blob, assigns in by_blob.items():
        vals, counts = np.unique(assigns, return_counts=True)
        maj = vals[np.argmax(counts)]
        assert counts.max() / len(assigns) >= 0.95, f"blob {blob} split"
        units.add(int(maj))
    assert len(units) == 3, "blobs collapsed onto fewer units"


def test_som_cluster_range(spark):
    df = _clustered_points(spark)
    som = BatchSOM(3, 3, max_iter=3, seed=1).fit(df)
    vals = {r["transaction_cluster"] for r in som.transform(df).collect()}
    assert vals <= set(range(9))


def test_dense_hash_features_shape(spark):
    baskets = spark.createDataFrame(
        [(1, "2024-01-01", ["a", "b", "a"]), (2, "2024-01-02", ["c"])],
        "user_id int, ts string, items array<string>",
    )
    out = dense_hash_features(baskets, dim=16).collect()
    assert all(len(r["features"]) == 16 for r in out)
    # counts preserved: row 1 has 3 item occurrences
    sums = {r["user_id"]: sum(r["features"]) for r in out}
    assert sums == {1: 3.0, 2: 1.0}


def test_som_local_and_distributed_fit_paths_equivalent(spark):
    """fit() collects the (bounded) training sample and iterates
    locally when rows x dim fits local_fit_budget; above it, the
    per-iteration distributed loop runs.  Same data + seed must give
    the same codebook either way (float tolerance: partial sums
    accumulate in different orders)."""
    df = _clustered_points(spark)
    local = BatchSOM(2, 2, max_iter=4, seed=42).fit(df)
    dist = BatchSOM(2, 2, max_iter=4, seed=42, fit_sample_rows=None).fit(df)
    np.testing.assert_allclose(
        local.codebook_, dist.codebook_, rtol=1e-9, atol=1e-12
    )
    ra = sorted(
        (r["id"], r["transaction_cluster"]) for r in local.transform(df).collect()
    )
    rb = sorted(
        (r["id"], r["transaction_cluster"]) for r in dist.transform(df).collect()
    )
    assert ra == rb


def test_som_topology_1d_manifold(spark):
    """The SOM-specific anchor k-means cannot pass: on points along a
    1-D manifold, a 1×k grid must order its units ALONG the manifold —
    BMU index is a monotone (up to direction) function of the curve
    parameter.  Textbook Kohonen topology preservation, independent of
    any twin implementation."""
    rng = np.random.default_rng(11)
    t = np.sort(rng.uniform(0, 1, 240))
    # embed the segment in 4-D with small noise
    pts = np.stack([t * 20, t * -12, t * 5, t * 8], axis=1)
    pts += rng.normal(0, 0.1, pts.shape)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in p]) for i, p in enumerate(pts)],
        "id int, features array<double>",
    )
    # 20 iterations: at 10 the map still carries one fold defect
    # (steps [-1,-1,-1,-1,+1,-1,-1]); by 20 it is strictly monotone
    som = BatchSOM(1, 6, max_iter=20, seed=42).fit(df)
    got = {
        r["id"]: r["transaction_cluster"] for r in som.transform(df).collect()
    }
    bmu = np.array([got[i] for i in range(len(t))])  # t is sorted
    # monotone up to direction: successive BMU steps never change sign
    steps = np.diff(bmu)
    steps = steps[steps != 0]
    assert len(steps) >= 3, "degenerate: fewer than 4 units used"
    assert (steps > 0).all() or (steps < 0).all(), bmu


def test_som_grid_adjacent_units_are_closer(spark):
    """Grid organization: codebooks of grid-ADJACENT units must be
    closer in feature space (on average) than non-adjacent pairs —
    the neighborhood function's imprint that distinguishes a SOM
    codebook from an unordered k-means one."""
    df = _clustered_points(spark, n_per=60)
    som = BatchSOM(3, 3, max_iter=8, seed=42).fit(df)
    cb = som.codebook_
    grid = [(i // 3, i % 3) for i in range(9)]
    adj, non = [], []
    for i in range(9):
        for j in range(i + 1, 9):
            d = float(np.linalg.norm(cb[i] - cb[j]))
            gd = abs(grid[i][0] - grid[j][0]) + abs(grid[i][1] - grid[j][1])
            (adj if gd == 1 else non).append(d)
    assert np.mean(adj) < np.mean(non), (np.mean(adj), np.mean(non))

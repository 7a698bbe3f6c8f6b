"""Library entry points must not leak session-lifetime caches
(operators/cache_tracking.py — the shared form of the ALS/cf_lsh
release pattern, round-6)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _persistent_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_ann_and_pagerank_caches_release_to_baseline(spark):
    from recsys_spark_spark.operators.cache_tracking import release_tracked
    from recsys_spark_spark.operators.ivf import cosine_knn_ivf
    from recsys_spark_spark.operators.knn import cosine_knn_lsh
    from recsys_spark_spark.operators.pagerank import pagerank
    from recsys_spark_spark.operators.pq import cosine_knn_pq

    release_tracked()  # drain anything earlier tests left behind
    base_ids = _persistent_ids(spark)

    vecs = spark.range(80).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda j: F.sin(F.col("id") * (j + 1)).cast("double"),
        ).alias("embedding"),
    )
    queries = vecs.where(F.col("vec_id") < 3)
    cosine_knn_lsh(vecs, queries, 3).count()
    cosine_knn_ivf(vecs, queries, 3, n_cells=4, n_probe=2).count()
    cosine_knn_pq(vecs, queries, 3, m_sub=2, k_codes=4).count()

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (2, 3, 1.0), (3, 2, 1.0)],
        "src long, dst long, w double",
    )
    pagerank(edges, iters=2).count()

    # set-difference, not counts: the ContextCleaner may concurrently
    # evict OTHER tests' dead caches under a shared session (r6
    # full-suite lesson) — only ids NEW since base are ours to release
    assert _persistent_ids(spark) - base_ids  # the new caches exist...
    release_tracked()
    assert _persistent_ids(spark) - base_ids == set()  # ...all released


def test_scoped_release_only_evicts_own_caches(spark):
    """r6 ADVICE ownership model: two consumers sharing a session use
    scope tokens; releasing one owner's caches must leave the other's
    persisted, and a bare release still drains everything."""
    from recsys_spark_spark.operators.cache_tracking import (
        release_tracked,
        scope,
        track,
    )

    release_tracked()
    base_ids = _persistent_ids(spark)

    a, b = scope(), scope()
    df_a = track(spark.range(10).cache(), owner=a)
    df_b = track(spark.range(20).cache(), owner=b)
    df_a.count(), df_b.count()
    assert len(_persistent_ids(spark) - base_ids) == 2

    release_tracked(a)  # evicts ONLY owner a's cache
    assert len(_persistent_ids(spark) - base_ids) == 1
    assert df_b.storageLevel.useMemory  # b untouched

    release_tracked()  # bare form drains the rest regardless of owner
    assert _persistent_ids(spark) - base_ids == set()


def test_track_release_thread_safe(spark):
    """r7 ADVICE: the registry mutation is lock-guarded, so concurrent
    track/release from threads sharing the session can neither lose an
    entry (a cache that is never released) nor double-release one.
    Hammer the list with racing owners and assert exact accounting:
    every tracked cache ends uncached, and the registry ends empty."""
    import threading

    from recsys_spark_spark.operators import cache_tracking as ct

    ct.release_tracked()  # drain anything earlier tests left behind
    n_threads, n_each = 8, 25
    dfs = []
    lock = threading.Lock()

    def worker(_i: int) -> None:
        tok = ct.scope()
        mine = []
        for j in range(n_each):
            df = spark.range(j + 1).cache()
            ct.track(df, owner=tok)
            mine.append(df)
        ct.release_tracked(tok)
        with lock:
            dfs.extend(mine)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert len(dfs) == n_threads * n_each
    assert all(not df.is_cached for df in dfs)
    assert ct._tracked == []

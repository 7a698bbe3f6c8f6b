"""Physical-plan regression guards: the properties PERF.md claims
(pushdown, pruning, broadcast strategy, distributed top-k, no
accidental cartesian products) asserted on the ACTUAL plans, so a
future edit that silently degrades a plan fails a test instead of a
benchmark.

These inspect the pre-execution AQE plan (AdaptiveSparkPlan with
isFinalPlan=false): scan pushdown, join strategy hints, and operator
choice are all decided before runtime re-optimization.
"""

from __future__ import annotations

import pytest

from recsys_spark_spark.plans.registry import DEMOTED, QUERIES, _load_all


def plan_of(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


@pytest.fixture(scope="module")
def queries():
    _load_all()
    # plan guards cover BOTH correctness tiers — the registered/demoted
    # split rotates round-to-round but plan shape must not regress
    return {**QUERIES, **DEMOTED}


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir, queries):
    p = plan_of(queries["q1_pricing_summary"].fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # column pruning: the scan must not read l_orderkey/l_partkey etc.
    scan = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in scan and "l_comment" not in scan
    # map-side combine before the single shuffle
    assert "partial_sum" in p
    assert p.count("Exchange") >= 1


def test_q3_q5_broadcast_dimensions(spark, sf_dir, queries):
    for q in ("q3_top_revenue_orders", "q5_region_revenue"):
        p = plan_of(queries[q].fn(spark, sf_dir))
        assert "BroadcastHashJoin" in p, f"{q}: dimension join not broadcast"
        assert "CartesianProduct" not in p


def test_top_tokens_distributed_topk(spark, sf_dir, queries):
    """Round-1 wrong #2: the global rank window funneled all tokens
    through one partition; the fix must plan TakeOrderedAndProject."""
    p = plan_of(queries["top_tokens"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_corpus_clean_pushes_lang_gate(spark, sf_dir, queries):
    """The composed pipeline's row-local language gate must reach the
    parquet scan (quality is computed so it can't push; lang can)."""
    p = plan_of(queries["corpus_clean"].fn(spark, sf_dir))
    assert "Not(In(lang" in p or "Not(EqualTo(lang" in p, "lang filter not pushed"


def test_corpus_train_ready_pushes_lang_gate(spark, sf_dir, queries):
    """The r7 bench flagship composes the same row-local gate as
    corpus_clean — its lang filter must reach the parquet scan too
    (the survivors feed three further stages, so a missed pushdown
    multiplies)."""
    p = plan_of(queries["corpus_train_ready"].fn(spark, sf_dir))
    assert "Not(In(lang" in p or "Not(EqualTo(lang" in p, "lang filter not pushed"


def test_skew_audit_head_is_group_limited(spark, sf_dir, queries):
    """The skew audit's hottest-key / top-N head must plan
    TakeOrderedAndProject over the count relation (never a full sort
    of all keys — at 100 TB the key relation is |users|-wide)."""
    p = plan_of(queries["events_key_skew_audit"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_explosion_audit_hot_key_is_group_limited(spark, sf_dir, queries):
    """Same discipline for the join-explosion audit: the hottest-key
    head is TakeOrderedAndProject over the |keys|-wide product
    relation (never a full sort), and nothing plans a CartesianProduct
    (the 1-row stat frames combine via broadcast)."""
    p = plan_of(queries["events_join_explosion_audit"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_sketch_winsorize_broadcasts_band_onto_facts(spark, sf_dir, queries):
    """The sketch-twin scaler's |types|-row band table must broadcast
    onto the fact scan — a shuffled join here would move the facts for
    a 5-row dimension."""
    p = plan_of(queries["events_value_features"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_no_cartesian_products_anywhere(spark, sf_dir, queries):
    """Every registered non-ML query plans without CartesianProduct;
    the only crossJoins in the engine are broadcast 1-row bounds or
    broadcast rule sets (which plan as BroadcastNestedLoopJoin)."""
    skip = {"sequential_topk", "als_topk"}  # eager ML fitting in plan build
    offenders = []
    for name, spec in queries.items():
        if name in skip:
            continue
        p = plan_of(spec.fn(spark, sf_dir))
        if "CartesianProduct" in p:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_knn_window_rank_is_group_limited(spark, sf_dir, queries):
    """Top-k windows must plan WindowGroupLimit (rank pruned before
    the exchange), not a full sort of every candidate."""
    for q in ("embedding_knn_lsh", "embedding_knn_ivf"):
        p = plan_of(queries[q].fn(spark, sf_dir))
        assert "WindowGroupLimit" in p, f"{q}: rank not group-limited"


def test_directed_sims_single_pair_join_subtree(spark):
    """PERF regression guard: directed pairwise_similarity must build
    ONE pair-join subtree (explode of both directions), never
    Union(X, mirror(X)) — Spark does not collapse the union branches
    (no ReusedExchange), so a union form executes the quadratic join
    twice."""
    from pyspark.sql import functions as F

    from recsys_spark_spark.functions.similarity import pairwise_similarity

    r = spark.createDataFrame(
        [(1, 10, 4.0), (2, 10, 3.0), (1, 11, 5.0), (2, 11, 2.0)],
        "user_id int, item_id int, rating double",
    )
    sims = pairwise_similarity(r, "cosine", "user", directed=True)
    p = plan_of(sims)
    assert "Union" not in p, "directed mirror reintroduced a Union"
    assert "Generate" in p  # the explode generator node
    # both directions still come out
    rows = {(x["user_a"], x["user_b"]) for x in sims.collect()}
    assert rows == {(1, 2), (2, 1)}


def tree_of(df) -> str:
    """Executed-plan tree string — each node printed once (the
    formatted explain repeats nodes in its details section)."""
    return df._jdf.queryExecution().executedPlan().toString()


def test_multi_kernel_sims_add_no_plan_nodes(spark):
    """The kernel merge (user_sims/item_sims compute 2 kernels from one
    pair-join aggregate) must NOT change the plan shape: adding a
    kernel is a projection, so join/aggregate/exchange counts must be
    IDENTICAL to the single-kernel plan."""
    from recsys_spark_spark.functions.similarity import pairwise_similarity

    r = spark.createDataFrame(
        [(u, i, float(u + i)) for u in range(4) for i in range(3)],
        "user_id int, item_id int, rating double",
    )
    single = tree_of(
        pairwise_similarity(r, "pearson", "user", directed=False, with_co=True)
    )
    both = tree_of(
        pairwise_similarity(
            r, ("cosine", "pearson"), "user", directed=False, with_co=True
        )
    )
    for op in ("Join", "HashAggregate", "Exchange"):
        assert single.count(op) == both.count(op), (
            f"{op} count changed: {single.count(op)} -> {both.count(op)}"
        )
    assert "sim_cosine" in both and "sim_pearson" in both


def test_cf_predictions_reuses_cached_ratings(spark, sf_dir, queries):
    """The 3-model union must read the ratings subtree from cache
    (InMemoryTableScan), not re-run orders x lineitem per branch."""
    p = plan_of(queries["cf_predictions"].fn(spark, sf_dir))
    assert "InMemoryTableScan" in p, "ratings cache not used"
    assert "CartesianProduct" not in p


def test_merged_dedup_docs_single_scan(spark, sf_dir, queries):
    """dedup_docs (exact + normalized + url_canonical keeper mappings,
    r14 merge) must stay ONE documents scan melting into ONE
    hash-partitioned window over (variant, dup_key) — the merge's
    fewer-shuffles claim, pinned."""
    t = tree_of(queries["dedup_docs"].fn(spark, sf_dir))
    assert t.count("Scan parquet") == 1, "documents scanned more than once"
    assert t.count("Window") == 1
    assert "Generate explode" in t, "variant melt (explode) missing"


def test_child_topk_plans_read_scored_cache(spark, sf_dir, queries):
    """Round-4 perf contract, r14 form: the standalone CF children read
    a CACHED shared relation (since r14 the RANK_CACHE_K ranked cache,
    shared with hybrid via plan identity; before r14 also the pre-rank
    scored DF, dropped because it had zero reuse and 2 x ~550 MiB of
    storage) — losing the cache would silently re-run the whole
    candidate subtree per query (8-9 s apiece at sf0.1)."""
    for name in ("user_topk_cosine", "item_topk_cosine"):
        p = plan_of(queries[name].fn(spark, sf_dir))
        assert "InMemoryTableScan" in p, f"{name}: ranked cache not in plan"


def test_bench_set_is_stable():
    """The bench set must not drift when the registered/demoted split
    rotates — round-over-round timing comparability depends on it.
    Additions are deliberate acts: update this list WITH the PERF.md
    note explaining the total change (als_topk joined in round 4,
    events_stream_quantile_sketch in round 5, corpus_train_ready — the
    flagship LLM-pipeline composition — in round 7, neardup_components
    — the composition's hottest stage as its own attributable line —
    in round 8)."""
    from recsys_spark_spark.plans.registry import bench_queries

    assert sorted(bench_queries()) == [
        "als_topk",
        "corpus_clean",
        "corpus_train_ready",
        "corpus_vocab",
        "doc_chunks",
        "embedding_knn_bruteforce",
        "embedding_knn_ivf",
        "embedding_knn_lsh",
        "events_stream_quantile_sketch",
        "hybrid_topk",
        "item_topk_cosine",
        "neardup_components",
        "neardup_minhash_lsh",
        "q1_pricing_summary",
        "q3_top_revenue_orders",
        "q5_region_revenue",
        "sequential_topk",
        "user_topk_cosine",
    ]


def test_bench_normalized_grand_validity_domain():
    """The GEMM-normalized grand is a FIRST-ORDER model, trustworthy
    only near the calibration band: the r11 driver host probed
    18 GFLOPS (13× off-band) and the unconditional formula published
    an 8×-flattering 14.87 "normalized seconds" (VERDICT r11 #1).
    Off-band probes must null the field and self-identify as invalid
    so no cross-round reader can mistake a degraded-host artifact for
    a plan win or loss."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from bench import NORMALIZED_VALID_GFLOPS, normalized_grand

    lo, hi = NORMALIZED_VALID_GFLOPS
    # the r11 driver incident verbatim: 18 GFLOPS → nulled + invalid
    assert normalized_grand(198.3, 18.0) == (None, False)
    assert normalized_grand(100.0, hi * 2) == (None, False)
    # no probe (smoke scale): nothing to validate; a MEASURED 0.0 is an
    # off-band reading, not a skip (r12 ADVICE — the falsy check
    # misclassified a degenerate probe)
    assert normalized_grand(100.0, None) == (None, None)
    assert normalized_grand(100.0, 0.0) == (None, False)
    # in-band (incl. both edges): linear model applies
    assert normalized_grand(100.0, 240.0) == (100.0, True)
    assert normalized_grand(100.0, lo) == (round(100 * lo / 240.0, 3), True)
    assert normalized_grand(100.0, hi) == (round(100 * hi / 240.0, 3), True)


def test_bench_jvm_normalized_grand_contract():
    """r13 convention (VERDICT r12 #2): the JVM whole-stage-codegen
    calibration DRIVES cross-round normalization — the GEMM probe
    proved 4.7x unstable on an idle host while the JVM band moved 8%,
    so GEMM can never drive it.  Same contract shape: None = no
    calibration, off-band (incl. a measured 0.0) = nulled + invalid,
    in-band = linear correction against the 5.4 Ghashes/s r12 pin."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from bench import (
        JVM_NORMALIZED_VALID_GHASHES,
        REFERENCE_JVM_GHASHES,
        normalized_grand_jvm,
    )

    lo, hi = JVM_NORMALIZED_VALID_GHASHES
    assert REFERENCE_JVM_GHASHES == 5.4  # the recorded r12 baseline
    assert lo == REFERENCE_JVM_GHASHES / 2 and hi == REFERENCE_JVM_GHASHES * 2
    assert normalized_grand_jvm(100.0, None) == (None, None)
    assert normalized_grand_jvm(100.0, 0.0) == (None, False)
    assert normalized_grand_jvm(100.0, hi * 2) == (None, False)
    # the r12 run-3 record verbatim: 152.402 s at 5.4 Ghashes/s is
    # 152.402 normalized seconds (the pin host normalizes to itself)
    assert normalized_grand_jvm(152.402, 5.4) == (152.402, True)
    assert normalized_grand_jvm(100.0, lo) == (round(100 * lo / 5.4, 3), True)
    assert normalized_grand_jvm(100.0, hi) == (round(100 * hi / 5.4, 3), True)


def test_bench_warmup_touches_no_test_data_tables():
    """Guard the measurement seam (VERDICT r14 #7): bench.py's
    pre-loop warm-ups may prime the JVM, parquet FOOTERS, and the
    Python-worker fleet, but must never read a test-data TABLE into
    cache or state — a future 'warm-up' that scans a fact table would
    be result precomputation, not warm-up.  Pins the warm-up inputs
    by source: the only parquet path read is region (footer probe,
    the smallest dimension), and the Python-worker warm-up feeds on
    spark.range, never a file."""
    import pathlib
    import re

    src = (
        pathlib.Path(__file__).parent.parent / "bench.py"
    ).read_text()
    # region of interest: everything before the timed loop
    pre_loop = src.split("for name, fn in order:")[0]
    reads = re.findall(r"read\.parquet\(f?[\"'](.*?)[\"']\)", pre_loop)
    assert reads == ["{sf_dir}/region.parquet"], reads
    # the worker warm-up's only relation is spark.range
    warm = re.search(r"def _warm.*?mapInPandas", pre_loop, re.S)
    assert warm is not None
    assert "spark.range(par).repartition(par).mapInPandas" in pre_loop
    # no other table() / parquet readers in the pre-loop region
    assert "ratings_from_sales" not in pre_loop
    assert pre_loop.count("read.parquet") == 1


def test_cooccurrence_lift_distributed_topn(spark, sf_dir, queries):
    """The top-100-by-lift must plan TakeOrderedAndProject (per
    partition top-N + tiny driver merge), not a global sort."""
    p = plan_of(queries["item_cooccurrence_lift"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p

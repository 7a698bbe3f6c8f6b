"""Multi-pass blocked fuzzy join (operators/blocking.py): pigeonhole
recall on planted typos, the hot-block cap + audit, the bounded
per-entity summary, and the measured recall of the registered ER
query against exact all-pairs edit distance on real names."""

from __future__ import annotations

from pyspark.sql import functions as F

from recsys_spark_spark.operators.blocking import (
    blocked_candidates,
    blocked_cap_audit,
    blocked_fuzzy_pairs,
    er_match_summary,
)


def _seg_passes(segments):
    return [
        (f"seg{i}", F.substring(F.col("name"), p, w))
        for i, (p, w) in enumerate(segments, 1)
    ]


def test_pigeonhole_finds_planted_substitution_typos(spark):
    """d+1=3 segments over 9-char IDs: every pair within 2
    SUBSTITUTIONS shares >= 1 positional segment, so all planted
    typo pairs are found and verified with their exact distance."""
    names = spark.createDataFrame(
        [
            ("AAA111ZZZ",),  # base
            ("AAA111ZZX",),  # 1 sub in seg3
            ("AXA111ZZQ",),  # 2 subs (seg1+seg3), shares seg2
            ("QQQ111QQQ",),  # shares only seg2; dist 6 -> verify rejects
            ("BBBBBBBBB",),  # shares nothing with base
        ],
        "name string",
    )
    passes = _seg_passes([(1, 3), (4, 3), (7, 3)])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in blocked_fuzzy_pairs(names, "name", passes, 2).collect()
    }
    assert ("AAA111ZZX", "AAA111ZZZ", 1) in got
    assert ("AAA111ZZZ", "AXA111ZZQ", 2) in got
    assert ("AAA111ZZX", "AXA111ZZQ", 2) in got  # transitively close pair
    assert len(got) == 3  # the far names never pass the verify


def test_cap_drops_hot_block_and_audit_reports_it(spark):
    """A block past max_block is dropped BEFORE the pair join (no
    quadratic blowup on a degenerate key) and the audit relation
    reports exactly which pass lost how many rows."""
    rows = [(f"HOT{i:03d}XX",) for i in range(50)] + [
        ("ABC999YY",),
        ("ABD999YY",),
    ]
    names = spark.createDataFrame(rows, "name string")
    # the hot fifty share seg1 'HOT' AND seg3 'XX' (two 50-row hot
    # blocks); their seg2 digits are all distinct.  The planted pair
    # shares only its seg2 '999' block.
    passes = _seg_passes([(1, 3), (4, 3), (7, 2)])
    audit = {
        r["pass"]: (r["n_blocks_dropped"], r["rows_in_dropped"])
        for r in blocked_cap_audit(names, "name", passes, max_block=20)
        .collect()
    }
    assert audit["seg1"] == (1, 50)
    assert audit["seg3"] == (1, 50)
    assert audit["seg2"] == (0, 0)
    cand = blocked_candidates(names, "name", passes, max_block=20)
    got = {(r["name_a"], r["name_b"]) for r in cand.collect()}
    # the surviving pair still arrives via its seg2 '999' block
    assert ("ABC999YY", "ABD999YY") in got
    # no candidate pair relies on the dropped hot seg3 block alone:
    # hot names share no other segment, so they pair with nobody
    assert not any(a.startswith("HOT") and b.startswith("HOT") for a, b in got)


def test_er_summary_is_bounded_and_keeps_unmatched(spark):
    names = spark.createDataFrame(
        [("AAA",), ("AAB",), ("AAC",), ("ZZZ",)], "name string"
    )
    pairs = spark.createDataFrame(
        [("AAA", "AAB", 1), ("AAA", "AAC", 1), ("AAB", "AAC", 1)],
        "name_a string, name_b string, dist int",
    )
    got = {
        r["name"]: (r["n_matches"], r["best_match"], r["best_dist"])
        for r in er_match_summary(names, pairs, "name").collect()
    }
    assert len(got) == 4  # bounded: one row per entity, always
    assert got["AAA"] == (2, "AAB", 1)  # best ties break by name asc
    assert got["AAB"] == (2, "AAA", 1)
    assert got["ZZZ"] == (0, None, None)


def test_blocked_join_plan_is_equi_join_not_cartesian(spark, sf_dir):
    """The candidate stage must execute as a hash/merge EQUI-join on
    (pass, bk) — a planner fallback to BroadcastNestedLoopJoin or
    CartesianProduct would silently reintroduce the all-pairs scan
    the operator exists to avoid."""
    from recsys_spark_spark.plans.linkage import MAX_BUCKET, er_passes
    from recsys_spark_spark.sources.readers import table

    names = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_name").alias("name"))
        .distinct()
    )
    passes, array_passes = er_passes("name")
    pairs = blocked_fuzzy_pairs(
        names, "name", passes, 2, MAX_BUCKET, array_passes=array_passes
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan  # the equi-join is actually there


def test_er_query_recall_vs_exact_on_real_names(spark, sf_dir, duck):
    """The registered query's blocking recall against EXACT all-pairs
    ED<=2 over the real customer names (1500 at sf0.01, brute force
    affordable here, never in the engine).  r13 pass redesign
    (interleaved segment-pair keys + the suffix delete-1 neighborhood
    — rationale at plans/linkage.py::ER_N_SEGMENTS): equal-length
    ED<=2 = {Hamming<=2} ∪ {1-ins+1-del shifts}; the segment pairs
    are pigeonhole-exact for the first class while nothing drops, the
    delete-1 pass catches the second, so recall is 1.0 on this corpus
    (measured 0.92 under the r12 contiguous-segment design, whose
    all-names '000' head block dropped).  The cap stays active
    (MAX_BUCKET unchanged; the planted-hot-block test above keeps the
    drop path exercised) and the shared sizes relation feeds both the
    keep-filter and the audit (r12 ADVICE)."""
    from recsys_spark_spark.operators.blocking import block_sizes
    from recsys_spark_spark.plans.linkage import (
        ER_MAX_DIST,
        MAX_BUCKET,
        er_passes,
    )
    from recsys_spark_spark.sources.readers import table

    exact = duck.sql(
        f"""
        WITH n AS (SELECT DISTINCT c_name AS name FROM customer)
        SELECT a.name, b.name FROM n a JOIN n b
        ON a.name < b.name AND levenshtein(a.name, b.name) <= {ER_MAX_DIST}
        """
    ).fetchall()
    names = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_name").alias("name"))
        .distinct()
    )
    passes, array_passes = er_passes("name")
    sizes = block_sizes(names, "name", passes, array_passes)
    pairs = blocked_fuzzy_pairs(
        names,
        "name",
        passes,
        max_dist=ER_MAX_DIST,
        max_block=MAX_BUCKET,
        array_passes=array_passes,
        sizes=sizes,
    )
    got = {(r["name_a"], r["name_b"]) for r in pairs.collect()}
    ex = {tuple(r) for r in exact}
    assert got <= ex  # verify is exact: no false positives, ever
    recall = len(got & ex) / len(ex)
    assert recall >= 0.97, f"blocking recall regressed: {recall:.3f}"
    # no block outgrows the cap on this corpus under the interleaved
    # keys — the audit (fed by the SAME sizes relation as the
    # keep-filter) proves the recall is cap-free, not cap-lucky
    audit = {
        r["pass"]: r["n_blocks_dropped"]
        for r in blocked_cap_audit(
            names, "name", passes, MAX_BUCKET,
            array_passes=array_passes, sizes=sizes,
        ).collect()
    }
    assert set(audit) == {f"p{a}{b}" for a in range(4) for b in range(4) if a < b} | {"del1"}
    assert all(v == 0 for v in audit.values())
    assert recall == 1.0  # nothing dropped -> pigeonhole + del1 recall

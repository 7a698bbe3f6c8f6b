"""Property tests for the sequential recommender (SURVEY §5 item 2 —
pipeline properties, not cluster-id bit-parity: the KMeans-for-SOM
substitution makes ids legitimately diverge from the reference)."""

from __future__ import annotations

from pyspark.sql import functions as F

from recsys_spark_spark.recommenders.sequential import SequentialTopK


def _interactions(spark):
    rows = []
    # 8 users, 12 items, 6 months of weekly baskets; user u buys items
    # clustered around u % 4 so baskets quantize into distinct clusters
    import itertools

    for u, week in itertools.product(range(8), range(24)):
        base = (u % 4) * 3
        ts = f"2024-{1 + week // 4:02d}-{1 + (week % 4) * 7:02d} 10:00:00"
        for it in (base, base + 1, (base + week) % 12):
            rows.append((u, it, ts))
    return spark.createDataFrame(
        rows, "user_id int, item_id int, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_sequential_pipeline_properties(spark):
    inter = _interactions(spark)
    model = SequentialTopK(
        k_items=3, min_confidence=0.05, min_confidence_seq=0.01
    ).fit(inter)

    # periods are dense 0..n-1
    pids = [
        r.period_id
        for r in model.baskets_.select("period_id").distinct().collect()
    ]
    assert set(pids) <= set(range(model.n_periods))

    # every sequence item is "{cluster}_{relperiod}" with relperiod <= 0
    seqs = model.sequences_.collect()
    assert len(seqs) == 8
    for row in seqs:
        for tag in row["items"]:
            cluster, rel = tag.rsplit("_", 1)
            assert 0 <= int(cluster) < model.grid_height * model.grid_width
            assert -(model.n_periods - 1) <= int(rel) <= 0

    # rules: consequent in current period, antecedent never
    for r in model.rules_.collect():
        assert r["consequent"][0].endswith("_0")
        assert all(not a.endswith("_0") for a in r["antecedent"])
        assert 0.0 <= r["support"] <= 1.0
        assert 0.0 <= r["confidence"] <= 1.0

    rec = model.recommend()
    pdf = rec.toPandas()
    # top-k bounded, ranks dense from 1
    assert pdf.groupby("user_id")["rank"].max().le(3).all()
    assert (pdf.groupby("user_id")["rank"].min() == 1).all()
    # recommendations never include already-seen items
    seen = {
        (r.user_id, r.item_id)
        for r in model.seen_.collect()
    }
    assert all((u, i) not in seen for u, i in zip(pdf.user_id, pdf.item_id))


def test_sequential_deterministic(spark):
    inter = _interactions(spark)
    a = (
        SequentialTopK(k_items=3, min_confidence=0.05, min_confidence_seq=0.01)
        .fit(inter)
        .recommend()
        .toPandas()
        .sort_values(["user_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        SequentialTopK(k_items=3, min_confidence=0.05, min_confidence_seq=0.01)
        .fit(inter)
        .recommend()
        .toPandas()
        .sort_values(["user_id", "rank"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_fpgrowth_rules_golden(spark):
    """Golden FPGrowth + rework check on a hand-computable corpus:
    4 sequences over 2 tags; expected rules and their re-scored
    support/confidence are derivable by hand.

    Sequences: s1=[A_-1, B_0], s2=[A_-1, B_0], s3=[A_-1], s4=[B_0]
    FPGrowth(minSupport=0.25, minConfidence=0.5) mines A_-1 -> B_0
    with raw confidence 2/3; rework keeps it (consequent in period 0,
    antecedent survives the _0 strip), then recomputes over ALL
    sequences: n_xy=2, n_ant=3 -> support=0.5, confidence=2/3.
    """
    from pyspark.sql import functions as F

    from recsys_spark_spark.recommenders.sequential import SequentialTopK

    seqs = spark.createDataFrame(
        [(1, ["A_-1", "B_0"]), (2, ["A_-1", "B_0"]), (3, ["A_-1"]), (4, ["B_0"])],
        "user_id int, items array<string>",
    )
    model = SequentialTopK(
        min_support=0.25,
        min_confidence=0.5,
        min_support_seq=0.1,
        min_confidence_seq=0.1,
        # hand-computable corpus: disable the lattice noise floor so
        # the mined rule set matches the by-hand FPGrowth derivation
        min_support_count=0,
    )
    rules = model._mine_rules(seqs).collect()
    got = {
        (tuple(r["antecedent"]), tuple(r["consequent"])): (
            r["support"],
            r["confidence"],
        )
        for r in rules
    }
    assert got == {(("A_-1",), ("B_0",)): (0.5, 2.0 / 3.0)}


def test_rule_counts_golden(spark):
    """rule_counts (J6/U6) against hand-counted containment."""
    from recsys_spark_spark.recommenders.sequential import rule_counts

    seqs = spark.createDataFrame(
        [(1, ["x", "y", "z"]), (2, ["x", "z"]), (3, ["y"])],
        "user_id int, items array<string>",
    )
    rules = spark.createDataFrame(
        [(1, ["x"], ["z"]), (2, ["x", "y"], ["z"]), (3, ["q"], ["z"])],
        "rule_id int, antecedent array<string>, consequent array<string>",
    )
    got = {r["rule_id"]: (r["n_xy"], r["n_ant"]) for r in rule_counts(seqs, rules).collect()}
    assert got == {1: (2, 2), 2: (1, 1), 3: (0, 0)}
    # the explode-join fallback (>62-tag alphabets) must agree
    fb = {
        r["rule_id"]: (r["n_xy"], r["n_ant"])
        for r in rule_counts(seqs, rules, bitmask_max_tags=0).collect()
    }
    assert fb == got


def test_bitmask_and_fallback_paths_agree(spark, sf_dir):
    """The bitmask best-rule path and the explode-join fallback must
    produce identical recommendations (same ties, same ranks)."""
    from recsys_spark_spark.sources.readers import table

    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    inter = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).select(
        F.col("o_custkey").alias("user_id"),
        F.col("l_partkey").alias("item_id"),
        F.col("l_shipdate").alias("ts"),
    )
    fast = SequentialTopK(k_items=3).fit(inter)
    assert fast.bitmask_max_tags == 62  # default engages the mask path
    slow = SequentialTopK(k_items=3, bitmask_max_tags=0).fit(inter)
    a = sorted(map(tuple, fast.recommend().collect()))
    b = sorted(map(tuple, slow.recommend().collect()))
    assert a == b and a

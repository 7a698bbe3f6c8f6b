"""Feature-engineering plans (plans/features.py): hand-computed
invariants beyond the DuckDB oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    """A tiny planted events table: type 'a' has a spread + an extreme
    outlier; type 'b' is constant (degenerate band)."""
    rows = [
        (i, f"2024-01-0{1 + i % 5}", 1 + i % 3, "a", float(v), None)
        for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])
    ] + [(100 + j, "2024-01-02", 9, "b", 42.0, None) for j in range(4)]
    d = tmp_path_factory.mktemp("feat")
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts")).write.mode("overwrite").parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_winsorize_bounds_and_degenerate_band(spark, events_path):
    from recsys_spark_spark.plans.features import events_value_normalized

    out = events_value_normalized(spark, events_path).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    # every winsorized value inside its band; minmax inside [0, 1]
    for r in out:
        assert r["p01"] <= r["winsorized"] <= r["p99"]
        assert 0.0 <= r["minmax"] <= 1.0
    # the outlier 1000 clamps to p99 (minmax exactly 1)
    top = max(by_type["a"], key=lambda r: r["value"])
    assert top["value"] == 1000.0
    assert top["winsorized"] == top["p99"] and top["minmax"] == 1.0
    # constant type: p01 = p99 = 42 → minmax pinned 0.0, no error
    for r in by_type["b"]:
        assert r["p01"] == r["p99"] == 42.0
        assert r["winsorized"] == 42.0 and r["minmax"] == 0.0


def test_target_encoding_loo_and_prior(spark, events_path):
    from recsys_spark_spark.plans.features import (
        TE_SMOOTHING,
        events_user_target_encoding,
    )

    out = {r["event_id"]: r for r in
           events_user_target_encoding(spark, events_path).collect()}
    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000] + [42.0] * 4
    mu = sum(vals) / len(vals)
    # user 9 has four 42.0 facts: LOO of one = (126 + m·mu) / (3 + m)
    r9 = [out[100 + j] for j in range(4)][0]
    want = (126.0 + TE_SMOOTHING * mu) / (3 + TE_SMOOTHING)
    assert abs(r9["te_loo"] - round(want, 6)) < 2e-6
    # a 1-fact user degenerates to the prior exactly
    one_fact_users = {}
    for r in out.values():
        one_fact_users.setdefault(r["user_id"], []).append(r)
    singles = [rs[0] for rs in one_fact_users.values() if rs[0]["n_user"] == 1]
    for s in singles:
        assert abs(s["te_loo"] - round(mu, 6)) < 2e-6
    # the encoding never sees the row's own target: for the outlier
    # row (value 1000) the encoding is far below the naive user mean
    outlier = next(r for r in out.values() if r["value"] == 1000.0)
    user_rows = one_fact_users[outlier["user_id"]]
    naive_mean = sum(r["value"] for r in user_rows) / len(user_rows)
    if len(user_rows) > 1:
        assert outlier["te_loo"] < naive_mean


def test_sketch_winsorize_bounds_within_bin_width(spark, sf_dir):
    """The sketch twin's accuracy contract: per event_type and per
    winsor tail q, the histogram-interpolated bound lies within ONE
    bin width (HIST_W) of the ⌈q·n⌉-th order statistic — the rank the
    sketch targets (est interpolates inside that value's bin; see the
    section comment in plans/features.py for why the exact query's
    p·(n−1) interpolation adds a local-gap term instead)."""
    import math

    from pyspark.sql import Window

    from recsys_spark_spark.operators.sketches import HIST_W
    from recsys_spark_spark.plans.features import (
        WINSOR_HI,
        WINSOR_LO,
        events_value_normalized_sketch,
    )
    from recsys_spark_spark.sources.readers import table

    sk = {
        r["event_type"]: (r["p01_sk"], r["p99_sk"])
        for r in events_value_normalized_sketch(spark, sf_dir)
        .select("event_type", "p01_sk", "p99_sk")
        .distinct()
        .collect()
    }
    e = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = e.select(
        "event_type",
        F.col("value").cast("double").alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    rows = ranked.collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["rn"]] = (r["v"], r["n"])
    assert set(sk) == set(by_type)
    for t, (lo_sk, hi_sk) in sk.items():
        n = next(iter(by_type[t].values()))[1]
        for q, est in ((WINSOR_LO, lo_sk), (WINSOR_HI, hi_sk)):
            k = max(1, math.ceil(q * n))
            v_k = by_type[t][k][0]
            assert abs(est - v_k) <= HIST_W + 1e-9, (t, q, est, v_k)


def test_sketch_winsorize_constant_type_band_and_stability(spark, events_path):
    """A constant type bins into a single histogram cell: the sketch
    band collapses to within one bin width, every fact of the type
    gets the SAME minmax (constant input ⇒ constant feature), and the
    winsorized value is the clamp of the true value into the band —
    the semantics the exact query guarantees, at sketch accuracy."""
    from recsys_spark_spark.operators.sketches import HIST_W
    from recsys_spark_spark.plans.features import (
        events_value_normalized_sketch,
    )

    out = [
        r
        for r in events_value_normalized_sketch(spark, events_path).collect()
        if r["event_type"] == "b"
    ]
    assert out
    assert all(r["p99_sk"] - r["p01_sk"] <= HIST_W + 1e-9 for r in out)
    assert len({r["minmax"] for r in out}) == 1
    for r in out:
        assert r["p01_sk"] <= r["winsorized"] <= r["p99_sk"]

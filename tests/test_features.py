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

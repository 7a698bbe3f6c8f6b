"""Every registered query with an oracle must hash-match DuckDB —
the local twin of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from recsys_spark_spark.plans.registry import QUERIES, _load_all

from conftest import assert_df_matches_oracle

_load_all()
ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert_df_matches_oracle(df, duck, spec.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.limit(10).collect()
    assert df.columns == ["user_id", "item_id", "score", "rank"]
    assert len(rows) >= 0


def test_every_query_has_registry_entry(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0

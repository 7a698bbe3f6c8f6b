from __future__ import annotations

import os

import duckdb
import pytest

from recsys_spark_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="recsys-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_ORACLE


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with the parquet tables registered as views —
    mirrors the driver's oracle harness."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def assert_df_matches_oracle(spark_df, duck_con, sql, check_types=True):
    """Order-insensitive comparison of a Spark DataFrame vs DuckDB SQL —
    the same contract the driver's t2 gate applies (row count + columns
    + sorted-row equality)."""
    import math

    sdf = spark_df.toPandas()
    ddf = duck_con.sql(sql).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"columns differ: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    )
    cols = sorted(sdf.columns)
    assert len(sdf) == len(ddf), f"row counts differ: spark={len(sdf)} duck={len(ddf)}"

    def norm(df):
        rows = []
        for row in df[cols].itertuples(index=False):
            out = []
            for v in row:
                if isinstance(v, float):
                    if math.isnan(v):
                        out.append("NaN")
                    else:
                        out.append(f"{v:.6f}")
                else:
                    out.append(str(v))
            rows.append(tuple(out))
        return sorted(rows)

    srows, drows = norm(sdf), norm(ddf)
    mism = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b][:5]
    assert srows == drows, (
        f"value mismatch at sorted rows {mism}: "
        + "; ".join(f"spark={srows[i]} duck={drows[i]}" for i in mism)
    )

"""r10 scale probe for the SHUFFLE-JOIN skew answer.

The window-twin family answers per-key WINDOW skew; for shuffled
joins this engine's stated answer (session.py) is AQE's runtime
skew-join split — asserted since round 1, never measured in-repo.
This harness plants a fact table whose hot key owns 20M of 24M rows
(payload-padded so the hot shuffle partition crosses the skew
threshold and the hot partition's sort+join dominates the wall — a
first cut with a 4M-row hot key fired the split but measured only
1.03x because the even scan/shuffle dominated) joined to a 1M-row
dimension too large to broadcast, and runs the identical join twice
in separate sessions:

  A) AQE skew split ON  (the engine session's shape, thresholds set
     so the demo partition qualifies: skewedPartitionFactor 2,
     threshold 16 MB, advisory 8 MB);
  B) AQE skew split OFF (everything else identical).

Both runs are VALUE-verified against the closed-form join cardinality
and a bit_xor row hash computed once and compared across runs, so the
timing difference is attributable to the split alone.  The ON run's
formatted plan is grepped for the skew=true marker — the assertion
that the mechanism actually fired, not just that AQE was enabled.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

HOT_ROWS = 20_000_000
COLD_ROWS = 4_000_000
COLD_KEYS = 100_000
DIM_ROWS = 1_000_000
#: payload must be INCOMPRESSIBLE — skew detection reads compressed
#: map-output sizes, and a constant pad compresses to nothing (the
#: first draft's constant string left the 4M-row hot partition UNDER
#: the threshold); md5 hex of the row id keeps the bytes random
PAY_EXPR = "md5(cast(id AS STRING)) || md5(cast(id+1 AS STRING))"


def build(skew_on: bool) -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .appName(f"aqe-skew-{skew_on}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16MB",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        # force the shuffle join: the 1M-row dim must not broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )


def gen(spark):
    hot = spark.range(HOT_ROWS).select(
        F.lit(0).cast("long").alias("k"),
        F.col("id").alias("fid"),
        F.expr(PAY_EXPR).alias("pay"),
    )
    cold = spark.range(COLD_ROWS).select(
        (F.lit(1) + F.col("id") % COLD_KEYS).alias("k"),
        (F.lit(HOT_ROWS) + F.col("id")).alias("fid"),
        F.expr(PAY_EXPR).alias("pay"),
    )
    dim = spark.range(DIM_ROWS).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("dval")
    )
    return hot.unionByName(cold), dim


def run(skew_on: bool):
    spark = build(skew_on)
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = gen(spark)
    fact.write.mode("overwrite").parquet("/tmp/aqe_skew_fact.parquet")
    dim.write.mode("overwrite").parquet("/tmp/aqe_skew_dim.parquet")
    fact = spark.read.parquet("/tmp/aqe_skew_fact.parquet")
    dim = spark.read.parquet("/tmp/aqe_skew_dim.parquet")

    j = fact.join(dim, "k").select(
        "k", "fid", "dval", F.length("pay").alias("plen")
    )
    agg = j.selectExpr(
        "count(*) AS n", "bit_xor(xxhash64(k, fid, dval, plen)) AS h"
    )
    t0 = time.perf_counter()
    row = agg.collect()[0]
    wall = time.perf_counter() - t0

    # closed form: every fact row matches exactly one dim row (keys
    # 0..COLD_KEYS all exist in the 1M-key dim)
    assert row["n"] == HOT_ROWS + COLD_ROWS, row["n"]

    # the AQE FINAL plan lives on the dataframe that actually ran
    plan = agg._jdf.queryExecution().executedPlan().toString()
    fired = "skew=true" in plan
    if skew_on:
        assert fired, "AQE skew split did not fire — thresholds miss the demo"
    spark.stop()
    return wall, row["h"], fired


if __name__ == "__main__":
    w_on, h_on, f_on = run(True)
    w_off, h_off, f_off = run(False)
    assert h_on == h_off, "join results diverged between sessions"
    print(
        f"skew_split_on={w_on:.2f}s (skew-marker fired: {f_on}) "
        f"skew_split_off={w_off:.2f}s (fired: {f_off}) "
        f"speedup={w_off / w_on:.2f}x "
        f"(value-verified: closed-form cardinality + cross-session "
        f"bit-equal hashes)",
        flush=True,
    )

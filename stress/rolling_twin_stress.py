"""r10 scale probe for the time-RANGE rolling window
(orders_rolling_7d_revenue) and its ghost-replica bounded-task twin:
like every per-key window, the 100 TB hazard is a HOT CUSTOMER — the
plain form sorts that customer's whole order history in ONE task,
while the twin's tasks are bounded by (custkey, 28-day chunk).

Layout is closed-form so both runs are VALUE-verified, not just timed:
the hot customer places one 1.00-priced order every 600 seconds (600
divides the 7-day span exactly), so row k's trailing frame holds
exactly min(k+1, 1009) orders and revenue_7d == n_orders_7d * 1.00.
The harness asserts the exact histogram of frame sizes (1009 appears
N-1008 times, 1..1008 once each) on the plain form, then asserts the twin agrees with the
plain form bit-for-bit (bit_xor of xxhash64 over every column), then
reports the walls.  Background load: 60k uniform customers × 50
orders.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from recsys_spark_spark.plans.windows_extra import (  # noqa: E402
    ROLLING_SPAN_S,
    rolling_span_revenue,
    rolling_span_revenue_chunked,
)

SPAN = ROLLING_SPAN_S
STEP = 600  # divides SPAN exactly; steady-state frame = SPAN/STEP + 1 rows
FRAME_N = SPAN // STEP + 1  # 1009


def gen(hot_n: int, bg_users: int, bg_per_user: int):
    """Hot customer 1: hot_n orders at epochs k*STEP.  Background:
    bg_users customers × bg_per_user orders, one per day."""
    hot = spark.range(hot_n).select(
        F.col("id").alias("o_orderkey"),
        F.lit(1).cast("long").alias("o_custkey"),
        F.lit(1.00).alias("o_totalprice"),
        (F.col("id") * STEP).alias("_epoch"),
    )
    bg = spark.range(bg_users * bg_per_user).select(
        (F.lit(10_000_000) + F.col("id")).alias("o_orderkey"),
        (F.lit(1000) + F.col("id") % bg_users).alias("o_custkey"),
        F.lit(2.50).alias("o_totalprice"),
        ((F.col("id") / bg_users).cast("long") * 86400).alias("_epoch"),
    )
    return (
        hot.unionByName(bg)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.timestamp_seconds("_epoch").cast("timestamp_ntz").alias(
                "o_orderdate"
            ),
        )
    )


def run(tag: str, hot_n: int):
    o = gen(hot_n, 60_000, 50)
    o.write.mode("overwrite").parquet(f"/tmp/rolling_stress_{tag}.parquet")
    o = spark.read.parquet(f"/tmp/rolling_stress_{tag}.parquet")

    t0 = time.perf_counter()
    plain = rolling_span_revenue(o, SPAN)
    h_plain = plain.selectExpr("bit_xor(xxhash64(*)) AS h").collect()[0]["h"]
    w_plain = time.perf_counter() - t0

    # closed-form frame-size histogram on the hot key (value check)
    hist = {
        r["n"]: r["c"]
        for r in plain.where(F.col("custkey") == 1)
        .groupBy(F.col("n_orders_7d").alias("n"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert hist[FRAME_N] == hot_n - (FRAME_N - 1), hist.get(FRAME_N)
    assert all(
        hist[k] == 1 for k in range(1, FRAME_N)
    ), "warm-up ramp broken"
    mism = (
        plain.where(
            (F.col("custkey") == 1)
            & (
                F.col("revenue_7d")
                != F.col("n_orders_7d").cast("double") * 1.00
            )
        ).count()
    )
    assert mism == 0, f"{mism} hot rows break revenue == n * 1.00"

    t0 = time.perf_counter()
    chunked = rolling_span_revenue_chunked(o, SPAN, 4 * SPAN)
    h_chunked = chunked.selectExpr("bit_xor(xxhash64(*)) AS h").collect()[0][
        "h"
    ]
    w_chunked = time.perf_counter() - t0

    assert h_plain == h_chunked, "twin diverged from the plain form"
    print(
        f"{tag}: hot_n={hot_n:,} plain={w_plain:.2f}s "
        f"chunked={w_chunked:.2f}s ratio={w_plain / w_chunked:.2f}x "
        f"(value-verified: closed-form histogram + bit-equal hashes)",
        flush=True,
    )


if __name__ == "__main__":
    run("m2", 2_000_000)
    run("m10", 10_000_000)
    spark.stop()

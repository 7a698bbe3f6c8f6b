"""r11 scale probe for the as-of join (operators/asof.py) and its
bounded-task chunked twin — the FIFTH carry class (previous chunk's
last right-side struct).  Like every per-key window, the 100 TB hazard
is a HOT KEY: the plain union-trick sorts that key's whole merged
timeline in ONE task, while the twin's tasks are bounded by
(key, day-chunk).  The r10 rolling measurement (8.02x at 2M hot rows)
showed per-row-maintenance frames bite earliest; last(ignorenulls) is
the cheapest per-row window, so this probe pins where the CHEAP end of
the family crosses over.

Layout is closed-form so both runs are VALUE-verified, not just timed:
hot user 1 alternates view (epoch 2k) / purchase (epoch 2k+1), so
EVERY hot purchase's as-of view is exactly 1 second earlier — the
harness asserts zero violations on the plain form, then asserts the
twin agrees bit-for-bit (bit_xor of xxhash64 over every column), then
reports walls.  Background load: 60k uniform users x 50 view/purchase
pairs.
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

from recsys_spark_spark.operators.asof import (  # noqa: E402
    asof_join,
    asof_join_chunked,
)

CHUNK_S = 86_400


def gen(hot_n: int, bg_users: int, bg_per_user: int):
    """Hot user 1: hot_n (view @ 2k, purchase @ 2k+1) pairs.
    Background: bg_users users x bg_per_user pairs, one pair per
    user-day (view at noon, purchase one hour later)."""
    hot_v = spark.range(hot_n).select(
        F.lit(1).cast("long").alias("user_id"),
        (F.col("id") * 2).alias("_epoch"),
        F.lit("view").alias("event_type"),
        F.col("id").alias("event_id"),
    )
    hot_p = spark.range(hot_n).select(
        F.lit(1).cast("long").alias("user_id"),
        (F.col("id") * 2 + 1).alias("_epoch"),
        F.lit("purchase").alias("event_type"),
        (F.lit(1_000_000_000) + F.col("id")).alias("event_id"),
    )
    bg_day = (F.col("id") / bg_users).cast("long")
    bg_user = F.lit(1000) + F.col("id") % bg_users
    bg_v = spark.range(bg_users * bg_per_user).select(
        bg_user.alias("user_id"),
        (bg_day * 86400 + 43200).alias("_epoch"),
        F.lit("view").alias("event_type"),
        (F.lit(2_000_000_000) + F.col("id")).alias("event_id"),
    )
    bg_p = spark.range(bg_users * bg_per_user).select(
        bg_user.alias("user_id"),
        (bg_day * 86400 + 46800).alias("_epoch"),
        F.lit("purchase").alias("event_type"),
        (F.lit(3_000_000_000) + F.col("id")).alias("event_id"),
    )
    return (
        hot_v.unionByName(hot_p)
        .unionByName(bg_v)
        .unionByName(bg_p)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.timestamp_seconds("_epoch").cast("timestamp_ntz").alias("ts"),
        )
    )


def run(tag: str, hot_n: int):
    e = gen(hot_n, 60_000, 50)
    e.write.mode("overwrite").parquet(f"/tmp/asof_stress_{tag}.parquet")
    e = spark.read.parquet(f"/tmp/asof_stress_{tag}.parquet")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )

    t0 = time.perf_counter()
    plain = asof_join(
        purchases, views, by="user_id", value_col="ts", out_col="view_ts"
    )
    h_plain = plain.selectExpr("bit_xor(xxhash64(*)) AS h").collect()[0]["h"]
    w_plain = time.perf_counter() - t0

    # closed-form value check on the hot key: every purchase's as-of
    # view is exactly 1 second earlier
    bad = plain.where(
        (F.col("user_id") == 1)
        & (
            F.timestamp_diff("SECOND", F.col("view_ts"), F.col("ts"))
            != F.lit(1)
        )
    ).count()
    assert bad == 0, f"{bad} hot purchases break the 1-second as-of form"

    t0 = time.perf_counter()
    chunked = asof_join_chunked(
        purchases,
        views,
        by="user_id",
        value_col="ts",
        out_col="view_ts",
        chunk_s=CHUNK_S,
    )
    h_chunked = chunked.selectExpr("bit_xor(xxhash64(*)) AS h").collect()[0][
        "h"
    ]
    w_chunked = time.perf_counter() - t0

    assert h_plain == h_chunked, "twin diverged from the plain form"
    print(
        f"{tag}: hot_n={hot_n:,} purchases (x2 hot rows) "
        f"plain={w_plain:.2f}s chunked={w_chunked:.2f}s "
        f"ratio={w_plain / w_chunked:.2f}x "
        f"(value-verified: closed-form 1s gaps + bit-equal hashes)",
        flush=True,
    )


if __name__ == "__main__":
    run("m2", 2_000_000)
    run("m10", 10_000_000)
    spark.stop()

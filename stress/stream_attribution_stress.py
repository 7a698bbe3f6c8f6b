"""r11 streaming stress for the attribution interval join
(events_stream_attribution): a 7-DAY lookback is ~170x the 1-hour
join already stressed in stream_stress_join_stateful.py, so the state
horizon — not the output — is the thing to measure: with blocks 2
days apart and an 8-day watermark, ~5 blocks are in flight per side
and state must track that horizon, never the corpus.

State model (per side, in 2-day blocks): a VIEW must outlive the
purchase-side watermark past v_ts + lookback -> ceil((7d+8d)/2d) + ~3
trigger-lag blocks of views; a PURCHASE must outlive the view-side
watermark past p_ts -> ceil(8d/2d) + ~3 blocks of purchases.  The
harness asserts that bound AND that max state stays well under the
corpus (the eviction evidence; the horizon is fixed, the corpus
grows with B).

Closed-form layout so the output is VALUE-verified: group A users
(attributed) get one view exactly 3600 s before each block purchase;
group D users (direct) get purchases only.  Every block lands its own
day, so each output day must read (n_purchases, n_attributed,
attributed_value, direct_value, avg_gap_s) ==
(U_A + U_D, U_A, U_A*1.0, U_D*1.0, 3600.0) exactly.  The drained
stream result is then compared exceptAll-style against the BATCH
attribution over the same files (independent plan, same relation).
"""

import shutil
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

U_A = 100_000
U_D = 50_000
B = 26
BLOCK_S = 2 * 86400
T0 = "2024-01-20 12:00:00"
path = "/tmp/stress_attrib_events"
shutil.rmtree(path, ignore_errors=True)

t_gen = time.perf_counter()
for b in range(B):
    base_ts = F.to_timestamp(F.lit(T0)) + F.make_interval(
        secs=F.lit(float(b * BLOCK_S))
    )
    pa = spark.range(U_A).select(
        (F.lit(b) * 1_000_000 + F.col("id") * 4).alias("event_id"),
        base_ts.alias("ts"),
        F.col("id").alias("user_id"),
        F.lit("purchase").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    va = spark.range(U_A).select(
        (F.lit(b) * 1_000_000 + F.col("id") * 4 + 1).alias("event_id"),
        (base_ts - F.make_interval(secs=F.lit(3600.0))).alias("ts"),
        F.col("id").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    pd_ = spark.range(U_D).select(
        (F.lit(b) * 1_000_000 + F.col("id") * 4 + 2).alias("event_id"),
        base_ts.alias("ts"),
        (F.lit(1_000_000_000) + F.col("id")).alias("user_id"),
        F.lit("purchase").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    va.unionByName(pa).unionByName(pd_).coalesce(1).write.mode(
        "append"
    ).parquet(path)
n_total = spark.read.parquet(path).count()
assert n_total == B * (2 * U_A + U_D)
print(
    f"generated {n_total:,} events in {B} time-ordered files "
    f"({time.perf_counter()-t_gen:.1f}s)",
    flush=True,
)

from recsys_spark_spark.plans.windows_extra import (  # noqa: E402
    ATTRIB_WINDOW_US,
    _attribution_daily_agg,
    last_touch_attribution,
)
from recsys_spark_spark.streaming.joins import (  # noqa: E402
    attribution_view_pairs_stream,
)
from recsys_spark_spark.streaming.windows import read_events_stream  # noqa: E402

store_path = "/tmp/stress_attrib_store"
ck_path = "/tmp/stress_attrib_ck"
shutil.rmtree(store_path, ignore_errors=True)
shutil.rmtree(ck_path, ignore_errors=True)
ev = read_events_stream(spark, path, max_files_per_trigger=2, glob="*.parquet")
pairs = attribution_view_pairs_stream(ev, lookback="7 days", watermark="8 days")
t0 = time.perf_counter()
# parquet sink, NOT format("memory"): the pair relation is 2.6M rows
# and a memory sink keeps it all in the driver heap (first version of
# this harness GC-thrashed exactly there) — the real query sinks to
# parquet for the same reason
q = (
    pairs.writeStream.format("parquet")
    .option("path", store_path)
    .option("checkpointLocation", ck_path)
    .outputMode("append")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination()
t_drain = time.perf_counter() - t0
prog = [p for p in q.recentProgress if p["stateOperators"]]
state_rows = [p["stateOperators"][0]["numRowsTotal"] for p in prog]
print(
    f"drained in {t_drain:.1f}s over {len(prog)} triggers; join state "
    f"rows per trigger: {state_rows}",
    flush=True,
)
# per-side horizon bound (see header): views 11 blocks, purchases 7
horizon_bound = 11 * U_A + 7 * (U_A + U_D)
print(
    f"state max {max(state_rows):,} vs corpus {n_total:,} "
    f"({n_total/max(state_rows):.1f}x smaller) vs horizon bound "
    f"{horizon_bound:,}",
    flush=True,
)
assert max(state_rows) <= horizon_bound, max(state_rows)
assert max(state_rows) * 2 < n_total, "eviction not visible: state ~ corpus"
assert len(prog) >= 10, "multi-trigger requirement"

# read-back finish (the registered query's shape) + closed-form check
store = spark.read.parquet(store_path)
last_view = store.groupBy("purchase_id").agg(F.max("v_ts").alias("view_ts"))
purchases = (
    spark.read.parquet(path)
    .where(F.col("event_type") == "purchase")
    .select(F.col("event_id").alias("purchase_id"), "ts", "value")
)
enriched = purchases.join(last_view, "purchase_id", "left")
gap_us = F.timestamp_diff("MICROSECOND", F.col("view_ts"), F.col("ts"))
streamed = _attribution_daily_agg(
    enriched.select(
        "ts",
        "value",
        F.col("view_ts").isNotNull().alias("attributed"),
        gap_us.alias("gap_us"),
    )
)
rows = streamed.collect()
assert len(rows) == B, len(rows)
for r in rows:
    assert r["n_purchases"] == U_A + U_D, r
    assert r["n_attributed"] == U_A, r
    assert r["attributed_value"] == float(U_A), r
    assert r["direct_value"] == float(U_D), r
    assert r["avg_gap_s"] == 3600.0, r
print(f"closed-form daily rows verified ({B} days)", flush=True)

# independent-plan equality: batch as-of attribution over the same files
t0 = time.perf_counter()
batch = last_touch_attribution(spark.read.parquet(path), ATTRIB_WINDOW_US)
diff = streamed.exceptAll(batch).count() + batch.exceptAll(streamed).count()
print(
    f"stream-vs-batch exceptAll diff: {diff} "
    f"(batch side {time.perf_counter()-t0:.1f}s)",
    flush=True,
)
assert diff == 0
spark.stop()

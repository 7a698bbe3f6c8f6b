"""r8 streaming stress (VERDICT r7 #5): the last two L6 members never
pushed past pytest scale — the stream-stream interval join and the
applyInPandasWithState running totals — driven through ≥10× sf0.1
multi-trigger drains with state-store row counts measured against the
per-side watermark bound / distinct-key bound.

Join layout (closed-form): U users × B blocks, blocks 6h apart; per
(user, block) one purchase at Tb and views at Tb−600s/−1800s/−3540s
(inside the 1h lookback) + one at Tb−5400s (outside).  Expected output
= U·B·3 rows, gap_s ∈ {600, 1800, 3540}, Σgap = U·B·5940.  Files land
one block per file in time order, so the watermark advances block by
block and evicts earlier blocks' buffered rows — state must track the
horizon (~2-3 blocks), never the 1.25M total.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

U = 10_000
B = 25
BLOCK_S = 6 * 3600
T0 = "2024-01-01 12:00:00"
path = "/tmp/stress_pv_events"

import shutil, os
shutil.rmtree(path, ignore_errors=True)

# slots: (slot, offset_s, type) — purchase at 0, 3 in-window views, 1 out
slots = [(0, 0, "purchase"), (1, 600, "view"), (2, 1800, "view"),
         (3, 3540, "view"), (4, 5400, "view")]
slot_arr = F.array(*[
    F.struct(F.lit(s).alias("slot"), F.lit(o).alias("off"),
             F.lit(t).alias("etype"))
    for s, o, t in slots
])

t_gen = time.perf_counter()
for b in range(B):
    df = (spark.range(U)
          .select(F.col("id").alias("user_id"),
                  F.explode(slot_arr).alias("e"))
          .select(
              (F.lit(b) * 1_000_000 + F.col("user_id") * 10
               + F.col("e.slot")).alias("event_id"),
              (F.to_timestamp(F.lit(T0))
               + F.make_interval(secs=(F.lit(b * BLOCK_S)
                                       - F.col("e.off")).cast("double"))
               ).alias("ts"),
              "user_id",
              F.col("e.etype").alias("event_type"),
              F.lit(1.0).alias("value"),
              F.lit(None).cast("string").alias("props"),
          ))
    df.coalesce(1).write.mode("append").parquet(path)
n_total = spark.read.parquet(path).count()
print(f"generated {n_total} events in {B} time-ordered files "
      f"({time.perf_counter()-t_gen:.1f}s)", flush=True)
assert n_total == U * B * 5

from recsys_spark_spark.streaming.windows import read_events_stream
from recsys_spark_spark.streaming.joins import purchase_view_join_stream

ev = read_events_stream(spark, path, max_files_per_trigger=2,
                        glob="*.parquet")
joined = purchase_view_join_stream(ev)
t0 = time.perf_counter()
q = (joined.writeStream.format("memory").queryName("pv_scale")
     .outputMode("append").trigger(availableNow=True).start())
q.awaitTermination()
t_join = time.perf_counter() - t0
prog = [p for p in q.recentProgress if p["stateOperators"]]
state_rows = [p["stateOperators"][0]["numRowsTotal"] for p in prog]
out = spark.table("pv_scale")
n_out = out.count()
agg = out.agg(F.sum("gap_s").alias("s"),
              F.array_sort(F.collect_set("gap_s")).alias("gaps")).collect()[0]
print(f"join: drained {n_total} events in {t_join:.1f}s over "
      f"{len(prog)} triggers -> {n_out} matches", flush=True)
print(f"join state rows per trigger: {state_rows}", flush=True)
print(f"join state max {max(state_rows)} vs total {n_total} events "
      f"({n_total/max(state_rows):.1f}x smaller); watermark-horizon "
      f"bound (3 blocks in flight) = {3 * U * 5}", flush=True)
assert n_out == U * B * 3, n_out
assert agg["s"] == U * B * (600 + 1800 + 3540), agg["s"]
assert list(agg["gaps"]) == [600, 1800, 3540], agg["gaps"]
assert len(prog) >= 10, "multi-trigger requirement"
assert max(state_rows) <= 3 * U * 5, max(state_rows)

# batch twin over the same files — identical expression, exact equality
batch = purchase_view_join_stream(spark.read.parquet(path))
diff = out.exceptAll(batch).count() + batch.exceptAll(out).count()
print(f"join stream-vs-batch exceptAll diff: {diff}", flush=True)
assert diff == 0

# ---- applyInPandasWithState running totals at 15x sf0.1 ----
from recsys_spark_spark.streaming.stateful import running_user_totals_stream

N2 = 1_500_000
U2 = 150_000
path2 = "/tmp/stress_state_events"
shutil.rmtree(path2, ignore_errors=True)
shutil.rmtree("/tmp/stress_state_ckpt_r8", ignore_errors=True)
gen2 = (spark.range(N2)
        .select(F.col("id").alias("event_id"),
                (F.to_timestamp(F.lit(T0))
                 + F.make_interval(secs=F.pmod(F.xxhash64("id"), 86400)
                                   .cast("double"))).alias("ts"),
                F.pmod(F.xxhash64("id", F.lit(1)), U2).alias("user_id"),
                F.lit("click").alias("event_type"),
                (F.pmod(F.xxhash64("id", F.lit(3)), 1000).cast("double")
                 / 10.0).alias("value"),
                F.lit(None).cast("string").alias("props")))
gen2.repartition(15).write.mode("overwrite").parquet(path2)

ev2 = read_events_stream(spark, path2, max_files_per_trigger=3,
                         glob="*.parquet")
stream = running_user_totals_stream(ev2)

import pandas as pd
last: dict[int, tuple[int, float]] = {}
n_batches = [0]

def sink(batch_df, batch_id):
    for r in batch_df.toPandas().itertuples(index=False):
        last[r.user_id] = (r.n_events, round(r.sum_value, 6))
    n_batches[0] += 1

t0 = time.perf_counter()
q2 = (stream.writeStream.foreachBatch(sink).outputMode("update")
      .option("checkpointLocation", "/tmp/stress_state_ckpt_r8")
      .trigger(availableNow=True).start())
q2.awaitTermination()
t_state = time.perf_counter() - t0
prog2 = [p for p in q2.recentProgress if p["stateOperators"]]
state2 = [p["stateOperators"][0]["numRowsTotal"] for p in prog2]
print(f"stateful: drained {N2} events in {t_state:.1f}s over "
      f"{n_batches[0]} batches; state rows per trigger: {state2}",
      flush=True)
assert n_batches[0] >= 5, "multi-trigger requirement"

want = {
    r["user_id"]: (r["n"], round(r["s"], 6))
    for r in spark.read.parquet(path2)
    .groupBy("user_id")
    .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    .collect()
}
# state = one row per distinct user EVER seen (NoTimeout contract):
# the hash-generated ids leave a handful of the U2 buckets empty, so
# the bound is the MEASURED distinct count, exactly
n_users = len(want)
assert state2[-1] == n_users, (state2[-1], n_users)
assert len(last) == n_users
assert last == want
print(f"stateful totals == batch aggregate for all {n_users} users; "
      f"state bound: {state2[-1]} rows == distinct users "
      f"({N2/state2[-1]:.0f} events/state-row)", flush=True)
print("ALL EXACT", flush=True)

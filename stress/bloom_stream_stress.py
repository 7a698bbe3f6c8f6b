"""Streamed Bloom maintenance at 30x sf0.1 events (r8): 3M events /
200k distinct users drained multi-trigger; state bound m/64 rows,
drained grid == batch build bit-exactly."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

N = 3_000_000
path = "/tmp/stress_events"  # reuse the r7 generator layout if present
import os
if not os.path.isdir(path):
    gen = (spark.range(N)
        .select(
            F.col("id").alias("event_id"),
            (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
             + F.make_interval(secs=(F.pmod(F.xxhash64("id"), 90 * 86400)).cast("double"))
             ).alias("ts"),
            F.pmod(F.xxhash64("id", F.lit(1)), 200_000).alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        ))
    gen.repartition(16).write.mode("overwrite").parquet(path)

from recsys_spark_spark.streaming.windows import (
    read_events_stream, run_stream_once, bloom_filter_stream,
)
from recsys_spark_spark.operators.bloom import (
    BLOOM_M_BITS, bloom_build,
)

ev = read_events_stream(spark, path, max_files_per_trigger=4, glob="*.parquet")
t0 = time.perf_counter()
streamed = run_stream_once(bloom_filter_stream(ev), "bloom_scale")
n_state = streamed.count()
t_drain = time.perf_counter() - t0
bound = BLOOM_M_BITS // 64
print(f"bloom stream: drained {N} events in {t_drain:.1f}s -> {n_state} "
      f"set-word state rows (bound m/64 = {bound}); "
      f"{N/n_state:.0f} events/state-row", flush=True)
assert n_state <= bound

batch = bloom_build(spark.read.parquet(path).select("user_id"), "user_id")
idx = spark.range(bound).select(F.col("id").cast("int").alias("w"))
drained = (idx.join(streamed, "w", "left")
           .select("w", F.coalesce("word", F.lit(0).cast("long")).alias("word"))
           .agg(F.transform(
               F.array_sort(F.collect_list(F.struct("w", "word"))),
               lambda s: s.getField("word")).alias("words")))
assert drained.collect()[0]["words"] == batch.collect()[0]["words"]
print("drained grid == batch build bit-exactly; ALL EXACT", flush=True)

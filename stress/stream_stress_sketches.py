"""Streamed-sketch scale stress: 3M synthetic events (30x sf0.1) over
90 days, drained through the streaming histogram + CMS maintenance
paths in MULTIPLE triggers; state/output row bounds asserted and the
drained grids compared bit-exactly against the batch builds."""
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
DAYS = 90
TYPES = ["click", "view", "purchase", "signup", "error"]
gen = (spark.range(N)
    .select(
        F.col("id").alias("event_id"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=(F.pmod(F.xxhash64("id"), DAYS * 86400)).cast("double"))
         ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(1)), 200_000).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in TYPES]),
            (F.pmod(F.xxhash64("id", F.lit(2)), 5) + 1).cast("int"),
        ).alias("event_type"),
        # heavy tail: quadratic transform of a uniform hash, range 0..~1000
        (F.pow(F.pmod(F.xxhash64("id", F.lit(3)), 1000).cast("double") / 1000.0, 4.0)
         * 1000.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    ))
path = "/tmp/stress_events"
gen.repartition(16).write.mode("overwrite").parquet(path)
print("generated", spark.read.parquet(path).count(), "events", flush=True)

from recsys_spark_spark.streaming.windows import (
    read_events_stream, histogram_sketch_stream, cms_user_sketch_stream,
    run_stream_once,
)
from recsys_spark_spark.operators.sketches import (
    HIST_NBINS, CMS_DEPTH, CMS_WIDTH, histogram_sketch, cms_hash_cols,
)

# ---- histogram sketch: multi-trigger incremental drain ----
ev = read_events_stream(spark, path, max_files_per_trigger=4, glob="*.parquet")
t0 = time.perf_counter()
streamed = run_stream_once(histogram_sketch_stream(ev), "hist_scale")
n_state = streamed.count()
t_hist = time.perf_counter() - t0
bound = DAYS * len(TYPES) * HIST_NBINS
print(f"hist: drained {N} events in {t_hist:.1f}s -> {n_state} sketch rows "
      f"(bound days*types*bins = {bound}); volume-independence ratio "
      f"{N/n_state:.0f} events/state-row", flush=True)
assert n_state <= bound

batch = histogram_sketch(
    spark.read.parquet(path)
         .withColumn("day", F.date_trunc("day", "ts").cast("date")),
    key_cols=["day", "event_type"])
diff = streamed.exceptAll(batch).count() + batch.exceptAll(streamed).count()
print(f"hist stream-vs-batch exceptAll diff: {diff}", flush=True)
assert diff == 0

# ---- CMS user sketch: same protocol ----
ev2 = read_events_stream(spark, path, max_files_per_trigger=4, glob="*.parquet")
t0 = time.perf_counter()
streamed_cms = run_stream_once(cms_user_sketch_stream(ev2), "cms_scale")
n_cms = streamed_cms.count()
t_cms = time.perf_counter() - t0
cms_bound = DAYS * CMS_DEPTH * CMS_WIDTH
print(f"cms: drained in {t_cms:.1f}s -> {n_cms} grid rows (bound "
      f"days*depth*width = {cms_bound}); {N/n_cms:.0f} events/state-row", flush=True)
assert n_cms <= cms_bound

e = spark.read.parquet(path)
cells = F.posexplode(F.array(*cms_hash_cols(F.col("user_id").cast("string"))))
batch_cms = (e.select(F.date_trunc("day", "ts").cast("date").alias("day"),
                      cells.alias("r", "b"))
             .groupBy("day", "r", "b").agg(F.count("*").alias("n")))
diff2 = streamed_cms.exceptAll(batch_cms).count() + batch_cms.exceptAll(streamed_cms).count()
print(f"cms stream-vs-batch exceptAll diff: {diff2}", flush=True)
assert diff2 == 0
print("ALL EXACT", flush=True)

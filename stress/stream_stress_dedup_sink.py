"""r9 streaming stress (VERDICT r8 #4): the two L6 members that never
pushed past pytest scale — streaming exact dedup
(``dropDuplicatesWithinWatermark``) and the exactly-once
``foreachBatch`` sink's crash-REPLAY path.

Part 1 — dedup state bound.  B=20 hourly blocks × U=5,000 unique texts
per block, every text emitted TWICE in its block (in-horizon dup →
second copy must drop) and every block ≥ 3 re-emits E=500 texts from
block b−3 (three hours back, well past the 30-minute watermark → state
evicted → the re-emission is KEPT; that is the documented
best-effort-after-eviction contract, asserted exactly, not hand-
waved).  215k rows / 100k distinct hashes ≈ 40× the sf0.1 corpus; the
state bound under measurement is the watermark HORIZON's distinct
hashes (≈ 2 blocks ≈ 10k), never the 100k corpus-wide distinct count.

Part 2 — sink replay drill.  1M events drained through
write_stream_exactly_once in 10 micro-batches, then a crash between
"batch written" and "offsets committed" is simulated the real way:
delete the LAST commit marker from the checkpoint and restart — the
file source re-executes that batch with the SAME batch_id.  The
idempotent batch_id= partition layout must REPLACE, not append: total
rows, per-batch rows, and the full value hash must all be unchanged
(the r8 stale-checkpoint lesson made this the riskiest untested
contract).
"""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# ---------------------------------------------------------------- part 1
B = 20  # hourly blocks
U = 5_000  # unique texts per block
E = 500  # re-emissions of block b-2 texts in block b
BLOCK_S = 3600
WATERMARK = "30 minutes"
T0 = "2024-01-01 00:00:00"
src = "/tmp/stress_dedup_docs"
shutil.rmtree(src, ignore_errors=True)

t_gen = time.perf_counter()
for b in range(B):
    fresh = spark.range(U).select(
        (F.lit(b) * 100_000 + F.col("id")).alias("doc_id"),
        F.concat(F.lit(f"doc-{b}-"), F.col("id")).alias("text"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("copy"),
    )
    parts = [fresh]
    if b >= 3:
        parts.append(
            spark.range(E).select(
                (F.lit(b) * 100_000 + 90_000 + F.col("id")).alias("doc_id"),
                F.concat(F.lit(f"doc-{b - 3}-"), F.col("id")).alias("text"),
                F.lit(0).alias("copy"),
            )
        )
    df = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    df = df.select(
        "doc_id",
        "text",
        (
            F.to_timestamp(F.lit(T0))
            + F.make_interval(
                secs=(F.lit(b * BLOCK_S) + F.col("copy")).cast("double")
            )
        ).alias("ts"),
    )
    df.coalesce(1).write.mode("append").parquet(src)
n_total = spark.read.parquet(src).count()
exp_total = B * U * 2 + (B - 3) * E
print(
    f"dedup input: {n_total} rows, {B * U + 0} fresh distinct texts, "
    f"gen {time.perf_counter() - t_gen:.1f}s",
    flush=True,
)
assert n_total == exp_total, (n_total, exp_total)

from recsys_spark_spark.streaming.dedup import dedup_docs_stream

schema = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
    ]
)
stream = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
deduped = dedup_docs_stream(stream, ts_col="ts", watermark=WATERMARK)
t0 = time.perf_counter()
q = (
    deduped.writeStream.format("memory")
    .queryName("dedup_scale")
    .outputMode("append")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination()
t_dedup = time.perf_counter() - t0
prog = [p for p in q.recentProgress if p["stateOperators"]]
state_rows = [p["stateOperators"][0]["numRowsTotal"] for p in prog]
kept = spark.table("dedup_scale").count()
# every in-block duplicate dropped; every past-horizon re-emission kept
exp_kept = B * U + (B - 3) * E
print(
    f"dedup drain {t_dedup:.1f}s: kept={kept} (expect {exp_kept}), "
    f"state rows max={max(state_rows)} final={state_rows[-1]} "
    f"(horizon bound ~{2 * U}, corpus distinct {B * U})",
    flush=True,
)
assert kept == exp_kept, (kept, exp_kept)
# the state store must track the watermark horizon (~2 blocks of
# distinct hashes + the in-flight trigger), never the corpus
assert max(state_rows) <= 3 * U + E, state_rows
assert max(state_rows) < (B * U) / 5  # ≥5x below corpus-wide distinct

# re-emissions really were kept POST-eviction: each re-emitted text
# appears exactly twice across the whole output (once in block b-3,
# once in block b)
dup_counts = (
    spark.table("dedup_scale")
    .groupBy("text")
    .agg(F.count("*").alias("n"))
    .groupBy("n")
    .agg(F.count("*").alias("texts"))
    .collect()
)
by_n = {r["n"]: r["texts"] for r in dup_counts}
assert by_n.get(2, 0) == (B - 3) * E, by_n
assert by_n.get(1, 0) == B * U - (B - 3) * E, by_n
print(f"post-eviction re-emission contract exact: {by_n}", flush=True)

# ---------------------------------------------------------------- part 2
N_FILES = 20
ROWS_PER_FILE = 50_000  # 1M rows ≈ 10x sf0.1 events
ev_src = "/tmp/stress_sink_events"
out = "/tmp/stress_sink_out"
ckpt = "/tmp/stress_sink_ckpt"
for p in (ev_src, out, ckpt):
    shutil.rmtree(p, ignore_errors=True)

t_gen = time.perf_counter()
for i in range(N_FILES):
    (
        spark.range(ROWS_PER_FILE)
        .select(
            (F.lit(i) * ROWS_PER_FILE + F.col("id")).alias("event_id"),
            (F.col("id") % 1000).alias("user_id"),
            (F.col("id") % 7).cast("double").alias("value"),
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(ev_src)
    )
print(
    f"sink input: {N_FILES * ROWS_PER_FILE} rows in {N_FILES} files, "
    f"gen {time.perf_counter() - t_gen:.1f}s",
    flush=True,
)

from recsys_spark_spark.streaming.sinks import (
    read_batched,
    write_stream_exactly_once,
)

ev_schema = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
    ]
)
stream = (
    spark.readStream.schema(ev_schema)
    .option("maxFilesPerTrigger", 2)
    .parquet(ev_src)
)
t0 = time.perf_counter()
q = write_stream_exactly_once(stream, out, ckpt)
q.awaitTermination()
t_drain = time.perf_counter() - t0
total1 = read_batched(spark, out).count()
hash1 = read_batched(spark, out).selectExpr(
    "bit_xor(xxhash64(*)) AS h"
).collect()[0][0]
per_batch1 = {
    r["batch_id"]: r["n"]
    for r in spark.read.parquet(out)
    .groupBy("batch_id")
    .agg(F.count("*").alias("n"))
    .collect()
}
last_batch = max(per_batch1)
print(
    f"drain {t_drain:.1f}s: {total1} rows in {len(per_batch1)} batches, "
    f"last batch {last_batch} = {per_batch1[last_batch]} rows",
    flush=True,
)
assert total1 == N_FILES * ROWS_PER_FILE

# crash simulation: the batch is in the sink, its commit marker is not
# (the local-fs checksum sidecar must go with it, or the restarted
# query fails renaming its new marker over the stale .crc)
crc = os.path.join(ckpt, "commits", f".{last_batch}.crc")
if os.path.exists(crc):
    os.remove(crc)
commit_marker = os.path.join(ckpt, "commits", str(last_batch))
assert os.path.exists(commit_marker), commit_marker
os.remove(commit_marker)
t0 = time.perf_counter()
q = write_stream_exactly_once(stream, out, ckpt)
q.awaitTermination()
t_replay = time.perf_counter() - t0
total2 = read_batched(spark, out).count()
hash2 = read_batched(spark, out).selectExpr(
    "bit_xor(xxhash64(*)) AS h"
).collect()[0][0]
per_batch2 = {
    r["batch_id"]: r["n"]
    for r in spark.read.parquet(out)
    .groupBy("batch_id")
    .agg(F.count("*").alias("n"))
    .collect()
}
print(
    f"replay of batch {last_batch} took {t_replay:.1f}s: total {total2} "
    f"(was {total1}), per-batch unchanged={per_batch1 == per_batch2}, "
    f"hash unchanged={hash1 == hash2}",
    flush=True,
)
assert total2 == total1, "replay APPENDED instead of replacing"
assert per_batch1 == per_batch2
assert hash1 == hash2
print("PASS: replay replaced its own batch_id partition bit-exactly", flush=True)
spark.stop()

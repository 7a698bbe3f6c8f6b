"""r11 scale probe for the KMV / bottom-k distinct sketch
(operators/sketches.py::kmv_bottom_k): the claims to measure are
(1) BOUNDED STATE — the mapInPandas partial keeps ≤ groups × k hashes
per partition and the finishing rank sees ≤ partitions × k rows per
group, so a hot group (10M distinct ids) never lands one task sorting
its full distinct set; (2) the sketch path beats the exact
COUNT(DISTINCT) it replaces; (3) the estimate lands inside the KMV
error bound at real scale.

Layout: one HOT group with 10M distinct ids + 200 background groups
x 50k ids (20M rows total, all distinct — worst case for distinct
machinery, best case for showing who pays).  Three contenders over
the same relation:
  naive    distinct -> per-group rank<=k window  (one task sorts the
           hot group's 10M distinct hashes — the straggler form)
  kmv      kmv_bottom_k (partial bottom-k per partition -> bounded
           global rank)
  exact    groupBy(g).agg(count_distinct(_h)) — what the sketch
           replaces at rollup time
Plus a SALTED-JVM contender (rank within (g, spark_partition_id)
then rank survivors — no Python) and the measurement that actually
justifies the sketch: a coarser rollup FROM the stored sketch
relation vs the exact fact rescan it replaces.

The harness asserts all bottom-k forms bit-equal, then checks every
estimate within 5 sigma (sigma = 1/sqrt(k-2)).

MEASURED VERDICT (recorded in PERF.md r11): at 20M rows the three
bottom-k constructions are a single noise band (naive 6.6-7.0s,
pandas partial 7.3-8.6s, salted JVM 6.3s warm / 13.3s cold across
two runs) and exact count-distinct is cheapest (4.7-4.9s) — NO form
wins construction wall at this scale; a 10M-row sort task simply is
not yet a straggler.  The sketch's justification is (a) the per-task
BOUND as the hot group grows past task memory (the naive window's
one-task sort is the only form with an unbounded task), and (b)
mergeability: rollup-from-sketch 0.45-0.68s vs 2.3-2.9s exact fact
rescan (4-5x, growing with fact volume — the merge input is
groups x k rows regardless of facts).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from recsys_spark_spark.operators.dedup import hash60  # noqa: E402
from recsys_spark_spark.operators.sketches import (  # noqa: E402
    KMV_K,
    kmv_bottom_k,
    kmv_estimate,
)

HOT_N = 10_000_000
BG_GROUPS = 200
BG_N = 50_000

hot = spark.range(HOT_N).select(
    F.lit("hot").alias("g"), F.col("id").alias("uid")
)
bg = spark.range(BG_GROUPS * BG_N).select(
    F.concat(F.lit("bg"), (F.col("id") % BG_GROUPS)).alias("g"),
    (F.lit(100_000_000) + F.col("id")).alias("uid"),
)
rel = (
    hot.unionByName(bg)
    .select("g", hash60(F.col("uid")).alias("_h"))
    .repartition(32)
)
rel.write.mode("overwrite").parquet("/tmp/kmv_stress.parquet")
rel = spark.read.parquet("/tmp/kmv_stress.parquet")
n = rel.count()
print(f"generated {n:,} rows ({BG_GROUPS + 1} groups, hot={HOT_N:,})", flush=True)

# exact COUNT(DISTINCT) — the aggregate the sketch replaces
t0 = time.perf_counter()
exact = {
    r["g"]: r["n"]
    for r in rel.groupBy("g").agg(F.count_distinct("_h").alias("n")).collect()
}
w_exact = time.perf_counter() - t0

# naive bottom-k: global distinct then one rank window per group —
# the hot group's 10M distinct hashes land ONE task
t0 = time.perf_counter()
wdw = Window.partitionBy("g").orderBy("_h")
naive = (
    rel.distinct()
    .withColumn("_rk", F.row_number().over(wdw))
    .where(F.col("_rk") <= KMV_K)
    .drop("_rk")
)
h_naive = naive.selectExpr("bit_xor(xxhash64(*)) AS h").collect()[0]["h"]
w_naive = time.perf_counter() - t0

# bounded-task sketch
t0 = time.perf_counter()
sk = kmv_bottom_k(rel, ["g"], KMV_K)
h_kmv = sk.selectExpr("bit_xor(xxhash64(*)) AS h").collect()[0]["h"]
w_kmv = time.perf_counter() - t0

assert h_naive == h_kmv, "bounded-task sketch diverged from naive bottom-k"

# salted-JVM contender: dedupe + rank within (g, input-partition),
# then dedupe + rank survivors — bounded tasks, zero Python
t0 = time.perf_counter()
s = rel.withColumn("_p", F.spark_partition_id())
d1 = s.groupBy("g", "_p", "_h").agg(F.lit(1).alias("_o")).drop("_o")
w1 = Window.partitionBy("g", "_p").orderBy("_h")
surv = (
    d1.withColumn("_rk", F.row_number().over(w1))
    .where(F.col("_rk") <= KMV_K)
    .drop("_rk", "_p")
)
d2 = surv.groupBy("g", "_h").agg(F.lit(1).alias("_o")).drop("_o")
w2 = Window.partitionBy("g").orderBy("_h")
salted = (
    d2.withColumn("_rk", F.row_number().over(w2))
    .where(F.col("_rk") <= KMV_K)
    .drop("_rk")
)
h_salted = salted.selectExpr("bit_xor(xxhash64(*)) AS h").collect()[0]["h"]
w_salted = time.perf_counter() - t0
assert h_salted == h_kmv, "salted form diverged"
print(f"salted-jvm bottom-k {w_salted:.2f}s", flush=True)

# the justifying measurement: coarser rollup FROM the stored sketch
# vs the exact fact rescan it replaces
sk.write.mode("overwrite").parquet("/tmp/kmv_store.parquet")
store = spark.read.parquet("/tmp/kmv_store.parquet")
t0 = time.perf_counter()
wall = Window.partitionBy(F.lit(1)).orderBy("_h")
m = (
    store.select("_h")
    .distinct()
    .withColumn("_rk", F.row_number().over(wall))
    .where(F.col("_rk") <= KMV_K)
    .agg(F.count("*").alias("ns"), F.max("_h").alias("kth"))
    .collect()[0]
)
w_merge = time.perf_counter() - t0
t0 = time.perf_counter()
true_all = rel.select("_h").distinct().count()
w_rescan = time.perf_counter() - t0
from recsys_spark_spark.operators.sketches import KMV_DOMAIN

est_all = (
    float(m["ns"])
    if m["ns"] < KMV_K
    else (KMV_K - 1) * KMV_DOMAIN / m["kth"]
)
print(
    f"rollup-from-sketch {w_merge:.2f}s (est {est_all:,.0f}) vs exact "
    f"rescan {w_rescan:.2f}s (true {true_all:,}) -> "
    f"{w_rescan/w_merge:.1f}x; rel err {abs(est_all-true_all)/true_all:.3f}",
    flush=True,
)
assert abs(est_all - true_all) / true_all <= 5 * (KMV_K - 2) ** -0.5

est = {
    r["g"]: r["est_users"]
    for r in kmv_estimate(sk, ["g"], KMV_K).collect()
}
sigma = (KMV_K - 2) ** -0.5
worst = max(abs(est[g] - exact[g]) / exact[g] for g in exact)
hot_err = abs(est["hot"] - exact["hot"]) / exact["hot"]
print(
    f"exact count-distinct {w_exact:.2f}s | naive bottom-k {w_naive:.2f}s "
    f"| kmv bounded {w_kmv:.2f}s (ratio naive/kmv {w_naive/w_kmv:.2f}x, "
    f"exact/kmv {w_exact/w_kmv:.2f}x)",
    flush=True,
)
print(
    f"hot estimate {est['hot']:,.0f} vs exact {exact['hot']:,} "
    f"(rel err {hot_err:.3f}); worst group rel err {worst:.3f}; "
    f"5-sigma bound {5*sigma:.3f}",
    flush=True,
)
assert worst <= 5 * sigma, worst
spark.stop()

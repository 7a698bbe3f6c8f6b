"""Bloom join-pruning scale stress (r8): 10M fact rows vs a 50k-key
build side (0.5% selectivity) — measure what the prune moves off the
shuffle: rows entering the verify join (the shuffle input) with and
without the Bloom filter, plus walls and the FP count vs the analytic
expectation at the default m=2^20 / k=5 sizing."""
import math
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

N, STEP = 10_000_000, 200
path = "/tmp/bloom_stress_facts"
(spark.range(N)
 .select(F.col("id").alias("fk"),
         F.pmod(F.xxhash64("id"), 1000).alias("v"))
 .repartition(32)
 .write.mode("overwrite").parquet(path))
facts = spark.read.parquet(path)
keys = spark.range(0, N, STEP).select(F.col("id").alias("k"))
n_keys = N // STEP

from recsys_spark_spark.operators.bloom import (
    BLOOM_K,
    BLOOM_M_BITS,
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)

# plain semi join: the whole fact table is shuffle input
t0 = time.perf_counter()
plain_n = facts.join(
    keys.select(F.col("k").alias("fk")), "fk", "left_semi"
).count()
t_plain = time.perf_counter() - t0

# bloom prune: candidates = what actually reaches the verify shuffle
t0 = time.perf_counter()
bloom = bloom_build(keys, "k")
cand = bloom_might_contain(facts, bloom, "fk").count()
t_prune = time.perf_counter() - t0

t0 = time.perf_counter()
bloom_n = bloom_semi_join(facts, keys, "fk", "k").count()
t_bloom = time.perf_counter() - t0

fp = cand - n_keys
fp_expect = (1 - math.exp(-BLOOM_K * n_keys / BLOOM_M_BITS)) ** BLOOM_K
fp_expected_n = fp_expect * (N - n_keys)
assert bloom_n == plain_n == n_keys, (bloom_n, plain_n, n_keys)
assert fp <= max(4 * fp_expected_n, 100), (fp, fp_expected_n)
print(
    f"facts {N}, keys {n_keys} (0.5%): plain semi-join {t_plain:.1f}s "
    f"shuffles {N} rows; bloom prune -> {cand} candidates "
    f"({N / cand:.0f}x fewer shuffle-input rows), FPs {fp} vs analytic "
    f"{fp_expected_n:.0f}; prune+count {t_prune:.1f}s, full "
    f"prune->verify semi-join {t_bloom:.1f}s, results identical "
    f"({bloom_n} rows)",
    flush=True,
)
print("ALL EXACT", flush=True)

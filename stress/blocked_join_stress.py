"""r12 scaling stress for the multi-pass blocked fuzzy join
(operators/blocking.py): the claim to verify is the cap-bounded
candidate volume — candidates <= max_block x rows x n_passes, LINEAR
in rows — against the naive all-pairs x levenshtein join, which is
quadratic and already dying at 30k names.

Corpus model (the realistic ER regime — entities with noisy
duplicates, NOT dense sequential IDs): n_base 30-char keys (md5
prefixes), each emitting one variant with exactly 2 deterministic
substitutions ('Z'/'Q' at hash-picked positions — 'Z'/'Q' are outside
the hex alphabet, so the planted distance is exactly 2).  Blocking =
the d+1 = 3 positional 10-char segments; 2 substitutions leave >= 1
segment intact, so EVERY planted pair must be found (asserted via
anti-join, not sampled) — segment space 16^10 makes cross-entity
block collisions negligible, which is exactly why block sizes (and
so candidate volume) track CLUSTER sizes, not corpus size.

Protocol: naive at 10k/20k/40k names (watch the x4 per doubling),
blocked at 0.5M/1M/2M names (watch ~x2 per doubling).  Run:
    python stress/blocked_join_stress.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from recsys_spark_spark.operators.blocking import blocked_fuzzy_pairs

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SEGS = [(1, 10), (11, 10), (21, 10)]
PASSES = [
    (f"seg{i}", F.substring(F.col("name"), p, w))
    for i, (p, w) in enumerate(SEGS, 1)
]


def corpus(n_base: int):
    base = spark.range(n_base).select(
        F.substring(F.md5(F.col("id").cast("string")), 1, 30).alias("name")
    )
    p1 = (F.abs(F.xxhash64("name")) % 30 + 1).cast("int")
    p2_raw = (F.abs(F.xxhash64("name", F.lit(7))) % 29 + 1).cast("int")
    p2 = F.when(p2_raw >= p1, p2_raw + 1).otherwise(p2_raw)  # p2 != p1
    lo, hi = F.least(p1, p2), F.greatest(p1, p2)
    variant = F.concat(
        F.substring("name", 1, 1).substr(F.lit(1), F.lit(0)),  # ''
        F.expr("substr(name, 1, least(_p1, _p2) - 1)"),
        F.lit("Z"),
        F.expr("substr(name, least(_p1, _p2) + 1, "
               "greatest(_p1, _p2) - least(_p1, _p2) - 1)"),
        F.lit("Q"),
        F.expr("substr(name, greatest(_p1, _p2) + 1, 30)"),
    )
    variants = (
        base.withColumn("_p1", p1)
        .withColumn("_p2", p2)
        .select("name", variant.alias("vname"))
    )
    planted = variants.select(
        F.least("name", "vname").alias("name_a"),
        F.greatest("name", "vname").alias("name_b"),
    )
    names = base.unionByName(
        variants.select(F.col("vname").alias("name"))
    )
    return names, planted


print("=== naive all-pairs x levenshtein (quadratic baseline) ===", flush=True)
for n in (10_000, 20_000, 40_000):
    names, _ = corpus(n // 2)
    names = names.cache()
    names.count()
    a, b = names.alias("a"), names.alias("b")
    t0 = time.perf_counter()
    cnt = (
        a.join(b, F.col("a.name") < F.col("b.name"))
        .where(F.levenshtein(F.col("a.name"), F.col("b.name")) <= 2)
        .count()
    )
    print(f"  n={n:>9,}: {time.perf_counter()-t0:7.1f}s  pairs={cnt:,}",
          flush=True)
    names.unpersist()

print("=== blocked (3-pass segment pigeonhole, cap 1000) ===", flush=True)
for n_base in (250_000, 500_000, 1_000_000):
    names, planted = corpus(n_base)
    names = names.cache()
    n = names.count()
    t0 = time.perf_counter()
    pairs = blocked_fuzzy_pairs(names, "name", PASSES, 2, 1000).cache()
    cnt = pairs.count()
    dt = time.perf_counter() - t0
    missing = planted.join(
        pairs.select("name_a", "name_b"), ["name_a", "name_b"], "left_anti"
    ).count()
    print(
        f"  n={n:>9,}: {dt:7.1f}s  pairs={cnt:,}  planted_missing={missing}",
        flush=True,
    )
    assert missing == 0, f"pigeonhole recall broken: {missing} planted lost"
    pairs.unpersist()
    names.unpersist()
print("done", flush=True)

"""MinHash band-cap stress (r9 VERDICT #4): measure the shipped
corpus' worst band bucket at sf0.1 and at 10x, then pin the hot-band
quadratic collapse the r10 MAX_MINHASH_BUCKET cap guards with a
capped-vs-uncapped A/B at growing planted boilerplate mass.

Expectations are ANALYTIC where possible: an over-cap bucket of size m
in one band costs C(m,2) candidate pairs; N_HOT identical docs collide
in ALL 16 bands but the candidate relation is DISTINCT pairs, so the
uncapped pipeline must verify C(N_HOT,2) pairs while the capped one
drops them before the join."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from recsys_spark_spark.operators.dedup import (
    MAX_MINHASH_BUCKET,
    band_rows,
    minhash_neardup_pairs,
    minhash_signatures,
    shingle_rows,
)

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
n01 = docs01.count()


def worst_buckets(docs, label):
    t0 = time.perf_counter()
    hist = (
        band_rows(minhash_signatures(shingle_rows(docs)))
        .groupBy("band", "bsig")
        .agg(F.count("*").alias("bsz"))
        .agg(
            F.max("bsz").alias("max_bsz"),
            F.sum(F.when(F.col("bsz") > MAX_MINHASH_BUCKET, 1).otherwise(0))
            .alias("n_over_cap"),
            F.sum(F.when(F.col("bsz") > 1, 1).otherwise(0)).alias("n_multi"),
            F.count("*").alias("n_buckets"),
        )
        .collect()[0]
    )
    dt = time.perf_counter() - t0
    print(
        f"{label}: docs={docs.count()} max_bucket={hist['max_bsz']} "
        f"over_cap(@{MAX_MINHASH_BUCKET})={hist['n_over_cap']} "
        f"multi_buckets={hist['n_multi']} buckets={hist['n_buckets']} "
        f"[{dt:.1f}s]",
        flush=True,
    )
    return hist["max_bsz"]


# 1) organic worst bucket at sf0.1
m1 = worst_buckets(docs01, "sf0.1 organic")

# 2) 10x EXACT-replication upper bound: every text appears 10x more,
#    so every bucket inflates by exactly 10 -- the adversarial "same
#    corpus, 10x duplication" bound.
reps = spark.range(10).select(F.col("id").alias("rep"))
docs10 = (
    docs01.crossJoin(F.broadcast(reps))
    .select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "text",
    )
    .repartition(32)
    .persist()
)
m10 = worst_buckets(docs10, "10x exact-replication")
assert m10 == 10 * m1, (m1, m10)

# 3) capped-vs-uncapped A/B at growing planted hot-band mass on top of
#    the sf0.1 corpus: N_HOT identical boilerplate docs are ONE band
#    bucket per band; candidates grow C(N_HOT,2).
for n_hot in (2000, 8000):
    hot = spark.range(n_hot).select(
        (F.col("id") + 50_000_000).alias("doc_id"),
        F.lit(
            "identical boilerplate header repeated verbatim across the "
            "whole crawl segment with no variation at all between pages"
        ).alias("text"),
    )
    corpus = (
        docs01.select("doc_id", "text").unionByName(hot)
        .repartition(32)
        .persist()
    )
    corpus.count()
    t0 = time.perf_counter()
    n_capped = minhash_neardup_pairs(corpus, threshold=0.5).count()
    t_cap = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_uncapped = minhash_neardup_pairs(
        corpus, threshold=0.5, max_bucket=None
    ).count()
    t_unc = time.perf_counter() - t0
    expect_hot_pairs = n_hot * (n_hot - 1) // 2
    assert n_uncapped - n_capped == expect_hot_pairs, (
        n_capped, n_uncapped, expect_hot_pairs,
    )
    print(
        f"n_hot={n_hot}: capped {t_cap:.1f}s ({n_capped} pairs) vs "
        f"uncapped {t_unc:.1f}s ({n_uncapped} pairs; verified exactly "
        f"C({n_hot},2)={expect_hot_pairs} hot pairs more) -> "
        f"{t_unc / t_cap:.2f}x",
        flush=True,
    )
    corpus.unpersist()

# 4) capped-only at 20k hot docs (uncapped would verify 2.0e8 pairs;
#    the avoided volume is the analytic C(20000,2) = 199,990,000).
n_hot = 20000
hot = spark.range(n_hot).select(
    (F.col("id") + 50_000_000).alias("doc_id"),
    F.lit(
        "identical boilerplate header repeated verbatim across the "
        "whole crawl segment with no variation at all between pages"
    ).alias("text"),
)
corpus = (
    docs01.select("doc_id", "text").unionByName(hot).repartition(32).persist()
)
corpus.count()
t0 = time.perf_counter()
n_capped = minhash_neardup_pairs(corpus, threshold=0.5).count()
t_cap = time.perf_counter() - t0
print(
    f"n_hot={n_hot}: capped {t_cap:.1f}s ({n_capped} pairs; avoided "
    f"C(20000,2)={n_hot*(n_hot-1)//2} hot-pair verifies)",
    flush=True,
)
print("MINHASH BAND CAP STRESS: OK", flush=True)

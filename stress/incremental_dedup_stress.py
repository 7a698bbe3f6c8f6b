"""r13 scaling stress for incremental dedup against a stored corpus
(operators/incremental.py): per-shard cost must be O(shard +
candidates) — FLAT as the stored corpus grows — while full batch
re-dedup of corpus+shard grows with the corpus.

Corpus: synthetic docs (token soup seeded per id, like the dedup
pytests) at growing sizes N with a FIXED 2k-doc shard; 5% of shard
docs are planted near-dups of stored docs.  For each N:
  - batch: minhash_neardup_pairs over corpus+shard (what a pipeline
    without a store must run per arriving shard)
  - incremental: store prebuilt (not timed — it amortizes over every
    future shard), match = shard signatures + band join + agreement
    verify (timed)
Run:
    python stress/incremental_dedup_stress.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

from recsys_spark_spark.operators.dedup import minhash_neardup_pairs
from recsys_spark_spark.operators.incremental import (
    incremental_neardup_matches,
    signature_store_frames,
)

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SHARD = 2_000


def synth_docs(n: int, id_start: int = 0, dup_of_start: int | None = None):
    """n docs of 30 deterministic tokens; if dup_of_start is set, every
    20th doc copies the text of (id - id_start + dup_of_start) with one
    token changed — a planted near-dup of a stored doc."""
    base = spark.range(id_start, id_start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(30)),
                lambda i: F.concat(
                    F.lit("w"),
                    ((F.xxhash64(F.col("id") * 1000 + i)) % 50000).cast(
                        "string"
                    ),
                ),
            ),
        ).alias("text"),
    )
    if dup_of_start is None:
        return base
    src = F.when(
        F.col("doc_id") % 20 == 0,
        F.col("doc_id") - id_start + dup_of_start,
    ).otherwise(F.col("doc_id"))
    return base.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(30)),
                lambda i: F.when(i == 1, F.lit("CHANGED")).otherwise(
                    F.concat(
                        F.lit("w"),
                        ((F.xxhash64(src * 1000 + i)) % 50000).cast("string"),
                    )
                ),
            ),
        ).alias("text"),
    )


def release():
    """Drop the batch path's internal shingle persists + SQL cache so
    iterations cannot pressure each other (the registry discipline)."""
    from recsys_spark_spark.plans.registry import release_query_state

    release_query_state(spark)


# untimed JIT/codegen warmup at a tiny size
_w = synth_docs(2_000)
minhash_neardup_pairs(_w, threshold=0.5).count()
ws, wb = signature_store_frames(_w)
incremental_neardup_matches(_w.limit(100), ws, wb).count()
release()

for n_corpus in (50_000, 100_000, 200_000, 400_000):
    corpus = synth_docs(n_corpus).cache()
    corpus.count()
    shard = synth_docs(SHARD, id_start=10_000_000, dup_of_start=0).cache()
    shard.count()

    t0 = time.time()
    n_pairs = minhash_neardup_pairs(
        corpus.unionByName(shard), threshold=0.5
    ).count()
    t_batch = time.time() - t0
    release()

    sigs, bands = signature_store_frames(corpus)
    sigs = sigs.cache()
    bands = bands.cache()
    sigs.count(), bands.count()  # store prebuilt (amortized, untimed)

    t0 = time.time()
    out = incremental_neardup_matches(shard, sigs, bands)
    n_dups = out.where("is_dup = 1").count()
    t_incr = time.time() - t0

    print(
        f"corpus={n_corpus:>7,} shard={SHARD:,}: "
        f"batch_rededup={t_batch:6.1f}s ({n_pairs:,} pairs)  "
        f"incremental={t_incr:5.1f}s ({n_dups:,} shard dups found / "
        f"{SHARD // 20} planted)",
        flush=True,
    )
    for df in (corpus, shard, sigs, bands):
        df.unpersist()
    release()

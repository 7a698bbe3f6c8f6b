"""r13 scaling stress for the iterative BPE trainer
(operators/bpe.py): per-merge cost must be VOCABULARY-width and flat
across iterations — the corpus is scanned once into the word
frequency table; a trainer whose iterations re-touched the corpus
would show per-merge time scaling with document count.

Run:
    python stress/bpe_train_stress.py [n_merges]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

from recsys_spark_spark.operators.bpe import (
    apply_merge,
    init_symbols,
    top_pair,
    word_vocab,
)

N_MERGES = int(sys.argv[1]) if len(sys.argv) > 1 else 60

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    t0 = time.time()
    vocab = word_vocab(docs)
    n_words = vocab.count()
    t_vocab = time.time() - t0

    sym = init_symbols(vocab).localCheckpoint(eager=True)
    iter_times = []
    merges = []
    for i in range(N_MERGES):
        if i and i % 8 == 0:
            sym = sym.localCheckpoint(eager=True)
        t0 = time.time()
        best = top_pair(sym)
        if best is None:
            break
        a, b, cnt = best
        merges.append((a, b))
        sym = apply_merge(sym, a, b)
        iter_times.append(time.time() - t0)
    head = [round(t, 2) for t in iter_times[:3]]
    tail = [round(t, 2) for t in iter_times[-3:]]
    print(
        f"{sf}: vocab={n_words:,} words ({t_vocab:.1f}s corpus scan), "
        f"{len(merges)} merges in {sum(iter_times):.1f}s "
        f"(per-iter head {head} tail {tail}); "
        f"first merges {merges[:5]}",
        flush=True,
    )

# the parquet corpus has a degenerate 31-word vocabulary (token soup),
# so per-iteration cost there is pure job overhead — synthesize a
# 300k-distinct-word corpus to exercise real vocabulary width
from pyspark.sql import functions as F  # noqa: E402

synth = spark.range(300_000).select(
    F.concat(
        F.lit("w"),
        F.conv(F.abs(F.xxhash64("id")) % 100_000_000_000, 10, 36),
    ).alias("word"),
    (F.abs(F.xxhash64("id", F.lit(1))) % 1000 + 1).alias("n"),
)
t0 = time.time()
sym = init_symbols(synth).localCheckpoint(eager=True)
iter_times = []
for i in range(20):
    if i and i % 8 == 0:
        sym = sym.localCheckpoint(eager=True)
    t0i = time.time()
    a, b, cnt = top_pair(sym)
    sym = apply_merge(sym, a, b)
    iter_times.append(time.time() - t0i)
print(
    f"synthetic 300k-word vocab: 20 merges in {sum(iter_times):.1f}s "
    f"(per-iter head {[round(t,2) for t in iter_times[:3]]} "
    f"tail {[round(t,2) for t in iter_times[-3:]]})",
    flush=True,
)

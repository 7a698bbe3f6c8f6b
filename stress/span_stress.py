"""Span-dedup scale stress (VERDICT r6 #5): doc_duplicate_spans +
doc_dedup_cut machinery at >=10x sf0.1 tokens with planted duplicate
density and ANALYTIC expectations (bit-exact check, triangle-stress
style)."""
import sys, time
sys.path.insert(0, "/root/repo")
import pandas as pd
from pyspark.sql import SparkSession
from recsys_spark_spark.operators.dedup import (
    DUP_WINDOW, dedup_cut_docs, duplicate_spans, duplicate_window_rows,
)

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

DOC_LEN = 100
N_CLEAN = 27000
N_SINGLE = 3000         # one 40-token block from a pool of 100
N_POOL = 100
N_DUAL = 100            # two dedicated blocks, far apart
BLK = 40

def block(k, tag):  return [f"{tag}{k}_{j}" for j in range(BLK)]
POOL = [block(k, "b") for k in range(N_POOL)]
E1, E2 = block(0, "e"), block(1, "f")

rows = []
doc = 0
for i in range(N_CLEAN):
    rows.append((doc, " ".join(f"u{doc}_{p}" for p in range(DOC_LEN)))); doc += 1
single_offsets = {}
for i in range(N_SINGLE):
    off = 10 + (i % 40)            # 1-based token offset = off+1
    blk = POOL[i % N_POOL]
    toks = [f"u{doc}_{p}" for p in range(DOC_LEN)]
    toks[off:off+BLK] = blk
    single_offsets[doc] = off + 1
    rows.append((doc, " ".join(toks))); doc += 1
dual_ids = []
for i in range(N_DUAL):
    toks = [f"u{doc}_{p}" for p in range(DOC_LEN)]
    toks[2:2+BLK] = E1             # span starts at token 3 (1-based)
    toks[58:58+BLK] = E2           # starts at 59; gap 59-(3+39)=17 > n=16
    dual_ids.append(doc)
    rows.append((doc, " ".join(toks))); doc += 1

pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
docs = spark.createDataFrame(pdf).repartition(32).cache()
n_docs = docs.count()
total_tokens = n_docs * DOC_LEN
print(f"corpus: {n_docs} docs, {total_tokens} tokens "
      f"({total_tokens/270704:.1f}x sf0.1)", flush=True)

t0 = time.perf_counter()
nwin = duplicate_window_rows(docs, DUP_WINDOW).count()
t_win = time.perf_counter() - t0
exp_win = n_docs * (DOC_LEN - DUP_WINDOW + 1)
print(f"window relation: {nwin} rows (expected {exp_win}) in {t_win:.1f}s", flush=True)
assert nwin == exp_win

t0 = time.perf_counter()
spans = duplicate_spans(docs, DUP_WINDOW).cache()
n_spans = spans.count()
t_spans = time.perf_counter() - t0
exp_spans = N_SINGLE + 2 * N_DUAL
print(f"duplicate_spans: {n_spans} spans (expected {exp_spans}) in {t_spans:.1f}s", flush=True)
assert n_spans == exp_spans
# every planted span exact: 25 windows, bounds [off, off+39]
from pyspark.sql import functions as F
chk = {r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
       for r in spans.collect()}
for d, off in list(single_offsets.items())[:500]:
    assert chk[d] == (off, off + BLK - 1, BLK - DUP_WINDOW + 1), (d, chk[d], off)
for d in dual_ids:
    pass  # dual docs have 2 spans; dict kept last only — count check below
n_dual_spans = spans.where(F.col("doc_id").isin(dual_ids)).count()
assert n_dual_spans == 2 * N_DUAL

t0 = time.perf_counter()
cut = dedup_cut_docs(docs, DUP_WINDOW).cache()
tot_cut = cut.agg(F.sum("n_cut_tokens")).collect()[0][0]
t_cut = time.perf_counter() - t0
per_pool = N_SINGLE // N_POOL          # 30 docs per pool block
exp_cut = N_POOL * (per_pool - 1) * BLK + 2 * (N_DUAL - 1) * BLK
print(f"dedup_cut: {tot_cut} tokens cut (expected {exp_cut}) in {t_cut:.1f}s", flush=True)
assert tot_cut == exp_cut
n_touched = cut.where(F.col("n_cut_tokens") > 0).count()
exp_touched = N_SINGLE - N_POOL + N_DUAL - 1
print(f"docs touched: {n_touched} (expected {exp_touched})", flush=True)
assert n_touched == exp_touched
dup_windows = (N_SINGLE * (BLK - DUP_WINDOW + 1)
               + N_DUAL * 2 * (BLK - DUP_WINDOW + 1))
print(f"measured bounds: dup windows {dup_windows} "
      f"({dup_windows/nwin*100:.1f}% of relation), coverage explode "
      f"{dup_windows * DUP_WINDOW} rows "
      f"({dup_windows * DUP_WINDOW / total_tokens:.2f}x corpus tokens, "
      f"duplicate-bounded)", flush=True)
print("ALL EXACT", flush=True)

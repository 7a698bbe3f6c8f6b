"""corpus_train_ready at ~12x sf0.1 tokens: every stage of the
flagship four-stage composition gets PLANTED inputs with closed-form
expectations — gate (low-quality + zh docs), exact dedup (identical
groups), transitive near-dup (J=0.98 triples), span cut (40-token
blocks shared 30 ways)."""
import sys, time
sys.path.insert(0, "/root/repo")
import pandas as pd
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

DOC_LEN = 100
BLK = 40
N_CLEAN, N_BLOCK, N_POOL = 27000, 3000, 100
N_LOWQ, N_ZH = 500, 500
N_EXACT_G, EXACT_SZ = 100, 5      # 100 groups of 5 identical
N_NEAR_G, NEAR_SZ = 100, 3       # 100 groups of 3 near-identical

rows, doc = [], 0
def clean_toks(d): return [f"u{d}x{p}" for p in range(DOC_LEN)]
for _ in range(N_CLEAN):
    rows.append((doc, "en", " ".join(clean_toks(doc)))); doc += 1
POOL = [[f"b{k}x{j}" for j in range(BLK)] for k in range(N_POOL)]
for i in range(N_BLOCK):
    t = clean_toks(doc); off = 10 + (i % 40)
    t[off:off+BLK] = POOL[i % N_POOL]
    rows.append((doc, "en", " ".join(t))); doc += 1
for i in range(N_LOWQ):  # heavy punctuation -> quality < 0.46
    t = " ".join("!!!" + w for w in clean_toks(doc))
    rows.append((doc, "en", t)); doc += 1
for i in range(N_ZH):    # dropped language
    rows.append((doc, "zh", " ".join(clean_toks(doc)))); doc += 1
exact_keepers = []
for g in range(N_EXACT_G):
    text = " ".join(f"e{g}x{p}" for p in range(DOC_LEN))
    exact_keepers.append(doc)
    for _ in range(EXACT_SZ):
        rows.append((doc, "en", text)); doc += 1
near_keepers = []
for g in range(N_NEAR_G):
    shared = [f"n{g}x{p}" for p in range(DOC_LEN - 1)]
    near_keepers.append(doc)
    for m in range(NEAR_SZ):  # md5-distinct, shingle J = 97/99
        rows.append((doc, "en", " ".join(shared + [f"t{doc}"]))); doc += 1

pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
import tempfile, os
d = tempfile.mkdtemp()
spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(
    os.path.join(d, "documents.parquet"))
n_docs = len(rows)
n_tok = sum(len(t.split()) for _, _, t in rows)
print(f"corpus: {n_docs} docs, {n_tok} tokens ({n_tok/270704:.1f}x sf0.1)", flush=True)

from recsys_spark_spark.plans.pipeline import corpus_train_ready
t0 = time.perf_counter()
out = corpus_train_ready(spark, d).persist()
n_out = out.count()
t_wall = time.perf_counter() - t0
exp_out = N_CLEAN + N_BLOCK + N_EXACT_G + N_NEAR_G
print(f"corpus_train_ready: {t_wall:.1f}s end-to-end, {n_out} rows "
      f"(expected {exp_out})", flush=True)
assert n_out == exp_out, (n_out, exp_out)

tot_cut = out.agg(F.sum(F.lit(1) * (F.size(F.split("text_clean", " ")) ))).collect()
cut_tokens = out.agg(
    (F.sum(F.when(F.col("text_clean") == "", 0).otherwise(0))).alias("z")
).collect()
# cut accounting: sum of (orig 100 - n_tokens_clean) over survivors
short = out.agg(F.sum(100 - F.col("n_tokens_clean")).alias("cut")).collect()[0]["cut"]
exp_cut = N_POOL * (N_BLOCK // N_POOL - 1) * BLK
print(f"tokens cut among survivors: {short} (expected {exp_cut})", flush=True)
assert short == exp_cut, (short, exp_cut)

keepers = {r["doc_id"] for r in out.select("doc_id").collect()}
assert set(exact_keepers) <= keepers and set(near_keepers) <= keepers
# min-id keeper rule: no non-keeper group member survived
assert len([k for k in keepers if k >= N_CLEAN + N_BLOCK + N_LOWQ + N_ZH]) == N_EXACT_G + N_NEAR_G
print("ALL EXACT", flush=True)

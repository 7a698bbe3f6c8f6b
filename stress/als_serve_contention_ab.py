"""r8 als_topk serve-contention A/B (VERDICT r7 #2): the driver bench
lands the SERVE stage at 31.8 s vs 5.5-6.3 s local on an unchanged
plan — reproduce the contention deliberately (background CPU hogs) and
A/B the two serve-side robustness levers:

  A: smaller per-task f32 score chunk (chunk_budget_f32 32M -> 8M
     elements, 128 MB -> 32 MB) — peak-memory-bandwidth hypothesis;
  B: 4x serve partitions (128 tasks instead of 32) — finer-grained
     stragglers hypothesis;
  AB: both.

One variant per process invocation (cold session); the hog starts
AFTER fit completes so only the serve stage is contended (matching the
driver stage split: fit==local, serve inflated).

Usage: python als_ab_r8.py <baseline|A|B|AB> <hog_n>
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

variant = sys.argv[1]
hog_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
params = {
    "baseline": {},
    "A": {"chunk_budget_f32": 8_000_000},
    "B": {"serve_partitions": 128},
    "AB": {"chunk_budget_f32": 8_000_000, "serve_partitions": 128},
}[variant]

from recsys_spark_spark.session import get_spark
from recsys_spark_spark.plans.recsys import _cached_ratings, K_ITEMS
from recsys_spark_spark.recommenders.als import als_topk

spark = get_spark(app_name=f"als-ab-{variant}")
sf_dir = "/root/testdata/sf0.1"
spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm JVM

t0 = time.perf_counter()
out = als_topk(_cached_ratings(spark, sf_dir), k_items=K_ITEMS, **params)
t_fit = time.perf_counter() - t0

hogs = []
if hog_n:
    hogs = [
        subprocess.Popen(
            [sys.executable, "-c", "while True:\n    pass"],
            stdout=subprocess.DEVNULL,
        )
        for _ in range(hog_n)
    ]
    time.sleep(0.5)  # let the hogs spin up

t1 = time.perf_counter()
h = out.selectExpr("bit_xor(xxhash64(*)) AS h").collect()[0][0]
t_serve = time.perf_counter() - t1

for p in hogs:
    p.kill()

print(
    f"RESULT {variant} hogs={hog_n}: fit={t_fit:.2f}s serve={t_serve:.2f}s "
    f"wall={t_fit + t_serve:.2f}s hash={h}",
    flush=True,
)
spark.stop()

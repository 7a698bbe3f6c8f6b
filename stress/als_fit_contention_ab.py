"""r9 als_topk FIT-contention A/B (VERDICT r8 next-round #2): the r8
driver artifact landed fit_and_index at 30.6 s vs 10.4 s local on an
UNCHANGED MLlib ``ALS.fit`` call (the serve half of the watch closed in
r8 after the 4×-finer-GEMM-task lever).  Reproduce the contention
deliberately — background CPU hogs covering the FIT stage this time —
and A/B the fit-side robustness levers:

  blocks16:  numUserBlocks = numItemBlocks = 16 instead of the auto
             grid (4 at sf0.1) — the fit-side granularity analogue of
             the shipped serve lever: more, smaller block-solve tasks
             so a descheduled core strands less work;
  blocks2:   2×2 grid — the opposite hypothesis (fewer exchange
             rounds beat finer tasks when the scheduler is starved);
  memdisk:   intermediateStorageLevel=MEMORY_AND_DISK — eviction
             robustness if the co-load squeezes the executor heap.

One variant per process invocation (cold session, like the r8 serve
harness); hogs start BEFORE ``als_topk`` and die after the eager fit
returns, so ONLY fit is contended (matching the r8 driver stage split:
serve == local, fit inflated 3×).

Usage: python als_fit_contention_ab.py <baseline|blocks16|blocks2|memdisk> <hog_n>
"""
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

variant = sys.argv[1]
hog_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
params = {
    "baseline": {},
    "blocks16": {"num_blocks": 16},
    "blocks2": {"num_blocks": 2},
    "memdisk": {"intermediate_storage": "MEMORY_AND_DISK"},
}[variant]

from recsys_spark_spark.session import get_spark
from recsys_spark_spark.plans.recsys import _cached_ratings, K_ITEMS
from recsys_spark_spark.recommenders.als import als_topk

spark = get_spark(app_name=f"als-fit-ab-{variant}")
sf_dir = "/root/testdata/sf0.1"
spark.read.parquet(f"{sf_dir}/region.parquet").count()  # warm JVM

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

t0 = time.perf_counter()
out = als_topk(_cached_ratings(spark, sf_dir), k_items=K_ITEMS, **params)
t_fit = time.perf_counter() - t0

for p in hogs:
    p.kill()
time.sleep(0.2)

t1 = time.perf_counter()
h = out.selectExpr("bit_xor(xxhash64(*)) AS h").collect()[0][0]
t_serve = time.perf_counter() - t1

print(
    f"RESULT {variant} hogs={hog_n}: fit={t_fit:.2f}s serve={t_serve:.2f}s "
    f"wall={t_fit + t_serve:.2f}s hash={h}",
    flush=True,
)
spark.stop()

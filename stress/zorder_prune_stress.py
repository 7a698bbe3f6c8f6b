"""r9 sink-side scale probe: how much does write_zordered's layout
actually prune at 10M rows?  Three layouts of the SAME 10M-row table
(x, y uniform in [0, 100k), 64 target files each):

  unsorted   — hash-shuffled baseline (no clustering),
  linear_x   — repartitionByRange + sort on x alone (the classic
               single-dimension sort),
  zorder_xy  — write_zordered on (x, y).

Evidence is measured TWO ways: (1) exact footer-stat admission — read
every parquet footer with pyarrow and count which files / row groups a
predicate's [min, max] box intersects (engine-independent: this is
precisely the skipping decision any stats-based reader makes), and
(2) Spark wall time for the filtered count on each layout.  Probes:
a 1%×1% box on (x, y), x-only, and y-only — the linear sort should
win x-only and lose y-only entirely; Z-order should prune BOTH
dimensions within ~√-factor of the linear sort's one.
"""
import glob
import sys
import time

sys.path.insert(0, "/root/repo")
import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from recsys_spark_spark.sources.writers import write_zordered

N = 10_000_000
DOM = 100_000
base = spark.range(N).select(
    F.col("id"),
    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(DOM)).alias("x"),
    F.pmod(F.xxhash64("id", F.lit(2)), F.lit(DOM)).alias("y"),
    F.md5(F.col("id").cast("string")).alias("payload"),
)

t0 = time.perf_counter()
base.repartition(64).write.mode("overwrite").parquet("/tmp/zp_unsorted")
t_uns = time.perf_counter() - t0
t0 = time.perf_counter()
(
    base.repartitionByRange(64, "x")
    .sortWithinPartitions("x")
    .write.mode("overwrite")
    .parquet("/tmp/zp_linear")
)
t_lin = time.perf_counter() - t0
t0 = time.perf_counter()
write_zordered(base, "/tmp/zp_zorder", ["x", "y"], n_files=64)
t_z = time.perf_counter() - t0
print(
    f"write walls: unsorted {t_uns:.1f}s, linear_x {t_lin:.1f}s, "
    f"zorder {t_z:.1f}s (clustering costs one range shuffle + sort)",
    flush=True,
)

LO, HI = 40_000, 41_000  # 1% of each dimension
PREDS = {
    "box_xy": {"x": (LO, HI), "y": (LO, HI)},
    "x_only": {"x": (LO, HI)},
    "y_only": {"y": (LO, HI)},
}


def admitted(path: str, pred: dict) -> tuple[int, int, int, int]:
    """(files admitted, total files, row groups admitted, total rgs)
    by exact footer min/max intersection — the stats-skipping decision
    any parquet reader makes."""
    fs = sorted(glob.glob(f"{path}/part-*.parquet"))
    fa = rga = rgt = 0
    for f in fs:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        file_hit = False
        for g in range(md.num_row_groups):
            rgt += 1
            ok = True
            for col, (lo, hi) in pred.items():
                st = md.row_group(g).column(names[col]).statistics
                if st.min > hi or st.max < lo:
                    ok = False
                    break
            if ok:
                rga += 1
                file_hit = True
        fa += int(file_hit)
    return fa, len(fs), rga, rgt


for pname, pred in PREDS.items():
    line = [f"{pname}:"]
    for tag, path in [
        ("unsorted", "/tmp/zp_unsorted"),
        ("linear_x", "/tmp/zp_linear"),
        ("zorder_xy", "/tmp/zp_zorder"),
    ]:
        fa, ft, rga, rgt = admitted(path, pred)
        cond = None
        for col, (lo, hi) in pred.items():
            c = F.col(col).between(lo, hi)
            cond = c if cond is None else (cond & c)
        t0 = time.perf_counter()
        n = spark.read.parquet(path).where(cond).count()
        w = time.perf_counter() - t0
        line.append(
            f"{tag} files {fa}/{ft} rgs {rga}/{rgt} scan {w:.2f}s rows {n}"
        )
    print("  ".join(line), flush=True)
spark.stop()

"""r9 multimodal-family scale probe: the Arrow-batched decode paths
(image_dhash over real P6 PPM payloads, wav_features over real RIFF
bytes) at 10× the sf0.1 corpus — 50k documents → 50k 48×32 rasters
(~230 MB of pixels) and 50k WAV payloads.  Measures linearity 1× → 10×
and the decode throughput in MB/s; correctness rides the per-row
value checks already oracled at sf0.01/0.1 (this probe asserts only
the exact row counts and hash-width invariants so a decode regression
cannot hide behind throughput).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from recsys_spark_spark.operators.multimodal import (
    PPM_H,
    PPM_W,
    image_dhash,
    audio_features,
    with_ppm_content,
    with_wav_content,
)


def docs(n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.md5(F.col("id").cast("string"))).alias(
            "text"
        ),
    )


raster_mb = lambda n: n * PPM_W * PPM_H * 3 / 1e6

for tag, n in [("warm", 2_000), ("1x", 5_000), ("10x", 50_000), ("100x", 500_000)]:
    d = docs(n)
    t0 = time.perf_counter()
    hashed = image_dhash(with_ppm_content(d))
    cnt = hashed.where(F.length("dhash") == 64).count()
    w_img = time.perf_counter() - t0
    assert cnt == n, (cnt, n)
    t0 = time.perf_counter()
    wf = audio_features(with_wav_content(d))
    cnt2 = wf.count()
    w_wav = time.perf_counter() - t0
    assert cnt2 == n, (cnt2, n)
    print(
        f"{tag}: dhash {n} rasters ({raster_mb(n):.0f} MB pixels) "
        f"{w_img:.2f}s = {raster_mb(n)/w_img:.0f} MB/s decode+hash; "
        f"wav {w_wav:.2f}s",
        flush=True,
    )
spark.stop()

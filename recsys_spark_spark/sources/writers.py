"""Sinks (SURVEY S3 replacement): the reference's only "sink" is a
driver-side Seq + println (Main.scala:108-110, accumulator side
channel) — here results leave as DataFrames, and persistent output is
partitioned parquet.

At 100 TB the layout decisions ARE the sink design:
- ``partition_by`` low-cardinality columns → directory partition
  pruning on read (a filter on the partition column never touches
  non-matching files);
- ``bucket_by`` high-cardinality join/agg keys → co-located scans
  that skip the shuffle on later joins (requires saveAsTable —
  bucketing metadata lives in the catalog);
- ``max_records_per_file`` bounds file sizes so downstream
  ``maxPartitionBytes`` splitting stays effective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write partitioned parquet; pair with read-side filters on the
    partition columns for pruning."""
    w = df.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: str,
    n_buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on ``bucket_by``
    between tables bucketed the same way skip their shuffle."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table_name, format="parquet")


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write line-delimited JSON (the LLM-corpus interchange format).
    gzip by default: JSONL is the hand-off format, and text JSON
    compresses ~10×; pass ``compression=None`` for plain text.  Reads
    back via ``sources.readers.read_documents_jsonl`` (schema-explicit,
    corrupt-line quarantine)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink — the columnar interchange format of Hive/Trino-side
    warehouses.  Same pushdown story as parquet (min/max stripe
    statistics, predicate pushdown, column pruning; Spark's vectorized
    ORC reader is on by default), so pipelines landing into a
    Hive-managed lake keep scan-level pruning."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


# --- Z-order clustering ------------------------------------------------------

def zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """A Morton (Z-order) key column interleaving the bits of the
    given NUMERIC columns (public technique behind Delta's OPTIMIZE
    ZORDER BY; Morton 1966): each column is min-max-normalized into
    [0, 2^bits) and their bits interleaved, so rows close in EVERY
    dimension get close keys.  Sorting files by this key gives every
    column partial clustering — per-file min/max footer stats then
    prune multi-dimension box predicates, where a linear sort clusters
    only its leading column and a filter on any other column touches
    every file.

    The min/max normalization stats are ONE collected row (O(cols)
    driver state, documented per repo convention); the key itself is
    a pure column expression — bits × cols shift/or terms, JVM-side,
    no UDF.

    The key is a SIGNED 64-bit long, so the interleave budget is 63
    bits: ``bits`` is clamped to ``63 // len(cols)`` (bits beyond the
    sign bit would flip the sort order, and Java shifts mask mod 64 —
    both silent corruptions of the curve).  An empty or all-NULL
    column degenerates to constant 0 in the key (span 1) instead of
    erroring, so an empty export writes an empty dataset like the
    sibling writers."""
    from pyspark.sql import functions as F

    bits = min(bits, 63 // len(cols))
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).first()
    scaled = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None:  # empty input / all-NULL column
            mn, mx = 0.0, 0.0
        span = (mx - mn) or 1.0
        v = F.least(
            F.floor(
                (F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
                * F.lit(float(1 << bits))
            ).cast("long"),
            F.lit((1 << bits) - 1),
        )
        # NULL values would otherwise propagate through the
        # floor/shift/OR chain into a NULL key, collapsing every
        # NULL-bearing row into one unsorted range partition — map
        # NULLs to bucket 0 so the documented all-NULL degeneration
        # (constant 0, span 1) actually holds row-wise too
        scaled.append(F.coalesce(v, F.lit(0).cast("long")))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, v in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(v, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + i,
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Parquet clustered along the Z-order curve of ``cols``:
    repartitionByRange on the Morton key (contiguous curve segments
    per file — range partitioning is what makes the footer min/max
    stats tight) + sortWithinPartitions for tight row-group stats
    inside each file.  Read-side filters on ANY of ``cols`` then skip
    files/row groups whose stats exclude the predicate — the
    multi-dimension complement of write_partitioned's directory
    pruning (which spends its one layout dimension on a single
    low-cardinality column)."""
    z = zorder_key(df, cols, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    split_col: str = "split",
    id_col: str = "doc_id",
    token_col: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize a training corpus as deterministically-sharded
    parquet plus a manifest — the deliverable end of the corpus
    pipeline (corpus_train_ready × corpus_splits), addressed the way
    a data loader consumes it:

        path/split=train/shard=17/part-*.parquet ...
        path/_manifest/  (one row per (split, shard): n_docs
                          [, n_tokens])

    shard = pmod(xxhash64(id)) — a pure function of the row, so a
    rerun or a different cluster layout lands every document in the
    SAME shard (resumable exports, stable loader addressing), and a
    loader can stride shards across workers without a coordinator.
    Directory partitioning by (split, shard) means a loader reading
    split=train/shard=k touches exactly its own files.  The manifest
    is aggregated from the WRITTEN FILES (read back after the shard
    write), so it cannot disagree with what's on disk even under a
    nondeterministic upstream, and the corpus lineage is executed
    once, not twice.  Returns the manifest DataFrame."""
    from pyspark.sql import functions as F

    sharded = docs.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )
    (
        sharded.repartition(split_col, "shard")
        .write.mode(mode)
        .partitionBy(split_col, "shard")
        .parquet(path)
    )
    aggs = [F.count("*").alias("n_docs")]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("bigint").alias("n_tokens"))
    # aggregate the files just written (an `_`-prefixed subdirectory is
    # invisible to parquet readers, so the manifest never shadows data)
    back = docs.sparkSession.read.parquet(path)
    manifest = back.groupBy(split_col, "shard").agg(*aggs)
    manifest.coalesce(1).write.mode(mode).parquet(f"{path}/_manifest")
    return manifest

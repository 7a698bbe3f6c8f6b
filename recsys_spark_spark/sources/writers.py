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

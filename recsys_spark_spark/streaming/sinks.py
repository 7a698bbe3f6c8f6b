"""Exactly-once streaming parquet sink (SURVEY L6 / S3 composition).

Structured Streaming's file sink is already exactly-once via its own
write-ahead log, but ONLY for append-mode file output.  Real
pipelines need ``foreachBatch`` (multi-sink fan-out, overwrite
semantics, JDBC, compaction...) — and ``foreachBatch`` is merely
AT-LEAST-once: after a crash between "batch written" and "offsets
committed", the restarted query REPLAYS the last batch with the same
``batch_id``.  The standard fix, implemented here, is to make the
batch write idempotent by keying the output layout on ``batch_id``:

    path/batch_id=<id>/part-*.parquet   (dynamic partition overwrite)

A replayed batch overwrites exactly its own partition — duplicates
are structurally impossible, no external transaction log needed.
Readers get a normal partitioned-parquet dataset (the synthetic
``batch_id`` column is dropped by :func:`read_batched`).

Scale shape: one directory per micro-batch; compact with a periodic
batch job if micro-batches are small (the sink takes
``max_records_per_file`` to keep splitting effective downstream,
matching sources/writers.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def make_idempotent_batch_writer(
    path: str,
    max_records_per_file: int | None = None,
):
    """The ``foreachBatch`` function: writes a micro-batch to its own
    ``batch_id=`` partition with dynamic partition overwrite, so a
    post-crash replay of the same batch replaces rather than appends.
    Exposed separately from :func:`write_stream_exactly_once` so tests
    can drive the replay contract directly."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if "batch_id" in batch_df.columns:
            raise ValueError(
                "input stream already has a 'batch_id' column — it would "
                "be clobbered by the sink's partition key and dropped by "
                "read_batched; rename it before the sink"
            )
        # dynamic mode scopes the overwrite to partitions present in
        # THIS write (the one batch_id), not the whole dataset.  Set
        # per-WRITER, never on the session conf: a session-level
        # toggle leaks to unrelated writes (and races a concurrent
        # stream's restore in the same session).
        w = (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
        )
        if max_records_per_file is not None:
            w = w.option("maxRecordsPerFile", max_records_per_file)
        w.parquet(path)

    return _write


def write_stream_exactly_once(
    df: DataFrame,
    path: str,
    checkpoint: str,
    max_records_per_file: int | None = None,
    available_now: bool = True,
    output_mode: str = "append",
):
    """Start an exactly-once ``foreachBatch`` parquet sink for a
    streaming DataFrame; returns the StreamingQuery.

    ``available_now=True`` drains everything currently available and
    stops (the batch-parity test harness shape); pass False for a
    continuously-running query.

    ``output_mode`` caveat for AGGREGATED streams: the batch_id
    scheme dedups REPLAYS of one batch, not re-emissions of the same
    group key across batches — in "update" mode an updated aggregate
    lands in a new batch_id partition alongside its stale
    predecessor.  Keep the default "append" (emits each finalized
    window/group exactly once, after the watermark closes it) unless
    the downstream reader reduces by key itself."""
    writer = (
        df.writeStream.foreachBatch(
            make_idempotent_batch_writer(path, max_records_per_file)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_batched(spark: SparkSession, path: str) -> DataFrame:
    """Read the sink's output back as a plain dataset (drops the
    synthetic ``batch_id`` partition column)."""
    return spark.read.parquet(path).drop("batch_id")


def compact_batched(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_partitions: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Offline compaction of a CLOSED batch_id-partitioned sink store
    (the periodic batch job the module docstring points to): small
    per-micro-batch directories are rewritten as one plain parquet
    dataset at ``dst_path`` (the synthetic ``batch_id`` column is
    dropped — the compacted store is a normal dataset, no longer
    replay-idempotent, so compact only after the stream is stopped or
    against a snapshot the stream has moved past).

    Writes to a NEW path on purpose: an in-place rewrite that crashes
    mid-way would destroy the only copy; the caller swaps paths (or
    repoints readers) after the write returns, keeping the source
    intact until then.

    ``target_partitions`` coalesces the write (no shuffle — the read
    partitions are many and small by construction, which is the
    problem being fixed); ``max_records_per_file`` keeps downstream
    splitting effective, matching sources/writers.py."""
    df = read_batched(spark, src_path)
    if target_partitions is not None:
        df = df.coalesce(target_partitions)
    w = df.write.mode("error")
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(dst_path)

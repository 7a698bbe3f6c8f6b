"""Exactly-once foreachBatch parquet sink (streaming/sinks.py):
stream-vs-batch content parity after an availableNow drain, plus the
idempotence contract — replaying a batch_id (the post-crash recovery
path) must replace its partition, never append."""

from __future__ import annotations

from pyspark.sql import functions as F

from recsys_spark_spark.sources.readers import table
from recsys_spark_spark.streaming.sinks import (
    make_idempotent_batch_writer,
    read_batched,
    write_stream_exactly_once,
)
from recsys_spark_spark.streaming.windows import read_events_stream


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


COLS = ["event_id", "user_id", "event_type"]


def test_sink_stream_matches_batch(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    stream = read_events_stream(spark, sf_dir).select(*COLS)
    q = write_stream_exactly_once(stream, out, ck)
    q.awaitTermination()
    got = read_batched(spark, out)
    want = table(spark, sf_dir, "events").select(*COLS)
    assert _rows(got, COLS) == _rows(want, COLS)


def test_sink_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    out = str(tmp_path / "replay")
    writer = make_idempotent_batch_writer(out)
    events = table(spark, sf_dir, "events").select(*COLS)
    b0 = events.where(F.col("user_id") % 2 == 0)
    b1 = events.where(F.col("user_id") % 2 == 1)
    writer(b0, 0)
    writer(b1, 1)
    before = _rows(read_batched(spark, out), COLS)
    # crash-recovery replay of batch 1: same id, same content
    writer(b1, 1)
    after = _rows(read_batched(spark, out), COLS)
    assert after == before == _rows(events, COLS)
    # replay must also REPLACE on content change (dynamic overwrite
    # scoped to the one batch_id partition — batch 0 untouched)
    writer(b1.limit(10), 1)
    n0 = b0.count()
    assert len(_rows(read_batched(spark, out), COLS)) == n0 + 10


def test_sketch_stream_to_sink_to_quantiles(spark, sf_dir, tmp_path):
    """End-to-end lambda-free composition: the streamed daily
    histogram sketch drains through the exactly-once sink into a
    parquet sketch table, and the batch quantile query over the
    READ-BACK table equals the quantiles computed from a direct batch
    sketch — i.e. a continuously-maintained sketch store serves
    identical answers.  (update mode + one availableNow drain: every
    window emits exactly once here; a continuous deployment keeps
    append mode per the sink docstring.)"""
    from recsys_spark_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
        merge_histograms,
    )
    from recsys_spark_spark.streaming.windows import histogram_sketch_stream

    out = str(tmp_path / "sketch_store")
    ck = str(tmp_path / "sketch_ck")
    stream = histogram_sketch_stream(read_events_stream(spark, sf_dir))
    q = write_stream_exactly_once(stream, out, ck, output_mode="update")
    q.awaitTermination()
    stored = read_batched(spark, out)
    got = histogram_quantiles(
        merge_histograms(stored, ["event_type"]), ["event_type"]
    )
    want = histogram_quantiles(
        histogram_sketch(table(spark, sf_dir, "events"), ["event_type"]),
        ["event_type"],
    )
    cols = ["event_type", "q", "n_total", "est"]
    assert _rows(got, cols) == _rows(want, cols)


def test_compaction_preserves_rows_and_reduces_files(spark, sf_dir, tmp_path):
    """compact_batched: the compacted store holds exactly the same
    rows in fewer files, and the source is left intact (new-path
    contract)."""
    import glob

    from recsys_spark_spark.streaming.sinks import compact_batched

    out = str(tmp_path / "many_batches")
    writer = make_idempotent_batch_writer(out)
    events = table(spark, sf_dir, "events").select(*COLS)
    # simulate many tiny micro-batches
    for b in range(8):
        writer(events.where(F.col("user_id") % 8 == b).repartition(4), b)
    before = _rows(read_batched(spark, out), COLS)
    n_src_files = len(glob.glob(f"{out}/batch_id=*/part-*.parquet"))

    compacted = str(tmp_path / "compacted")
    compact_batched(spark, out, compacted, target_partitions=2)
    after = _rows(spark.read.parquet(compacted), COLS)
    n_dst_files = len(glob.glob(f"{compacted}/part-*.parquet"))

    assert after == before
    assert n_dst_files <= 2 < n_src_files
    # source untouched
    assert _rows(read_batched(spark, out), COLS) == before

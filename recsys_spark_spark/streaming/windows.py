"""Streaming window operators over the events stream (SURVEY L6).

Each transformation here is the SAME logical plan as its batch twin
(plans/relational.py::events_daily / events_sessions) applied to a
``readStream`` source — the DataFrame code is identical by design,
which is the whole point of Structured Streaming.  Watermarks bound
the state store: at 100 TB/day the tumbling-window aggregation keeps
one row per (window, event_type) per partition in state, evicted one
day after the window closes.

The file source streams the same parquet the batch queries scan, so
tests can assert stream-vs-batch row equality after an
``availableNow`` pass (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import qround
from ..sources.readers import ensure_session_confs

def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    glob: str = "events.parquet",
    schema=None,
) -> DataFrame:
    """File-source stream of the events table with the same ts
    normalization as the batch reader (sources/readers.py::table).

    Streaming file sources need the schema declared up front, and the
    physical encoding of ``ts`` varies by generator: TIMESTAMP(NANOS)
    scans as long nanoseconds (under ``nanosAsLong``) and needs ``div
    1000``; TIMESTAMP(MICROS) without a timezone scans as
    TIMESTAMP_NTZ and must pass through untouched.  Sniff the footer
    once with a batch read — exactly what the batch reader keys on —
    instead of hardcoding either shape.

    SINGLE-SNIFF ASSUMPTION: the encoding is sniffed once at stream
    construction from the files present at that moment, so every file
    the directory ever receives must share ONE physical ts encoding
    (true for any one generator version writing the landing dir).  A
    producer that changes encoding mid-stream requires a stream restart
    to re-sniff — files with a different encoding than the first-seen
    one would otherwise be mis-decoded; per-batch validation is not
    possible because the streaming source fixes its schema up front.

    BOOTSTRAP: the sniff needs at least one file present.  For a
    landing directory that starts EMPTY, pass ``schema`` explicitly
    (the batch reader's schema of a sibling dataset, or the known
    ingest schema) — the stream then idles until files arrive instead
    of failing the construction-time batch read.
    """
    ensure_session_confs(spark)
    if schema is not None:
        batch_schema = schema
    else:
        try:
            batch_schema = (
                spark.read.option("pathGlobFilter", glob)
                .parquet(sf_dir)
                .schema
            )
        except Exception as exc:
            raise ValueError(
                f"read_events_stream: cannot sniff the ts encoding from "
                f"{sf_dir!r} (no matching files yet?).  For an empty "
                f"landing directory pass schema= explicitly."
            ) from exc
    # the file source monitors a DIRECTORY; pathGlobFilter narrows it
    # to the events file(s) (a prod deployment would point at a landing
    # directory receiving new files)
    reader = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    ts_type = dict((f.name, f.dataType.simpleString()) for f in batch_schema.fields)
    if ts_type.get("ts") == "bigint":  # nanos-as-long encoding
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type.get("ts") == "timestamp_ntz":
        # streaming event time (watermarks, window/session_window) is
        # only defined on TIMESTAMP; with the session tz pinned UTC
        # (ensure_session_confs) this cast preserves the wall-clock
        # values the batch twin sees
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def daily_counts_stream(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming twin of events_daily: tumbling 1-day window counts.

    The watermark bounds state: a window's row finalizes (append mode)
    once the watermark passes its end; late events beyond it are
    dropped rather than held forever."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            qround(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("day_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame, watermark: str = "1 day"
) -> DataFrame:
    """Streaming twin of events_sliding_1h: 1-hour windows sliding
    every 30 minutes — every event lands in exactly two windows.
    State is one row per (window, event_type) within the watermark
    horizon; the 2× row amplification happens at aggregation (each
    event updates two window rows), never by duplicating input."""
    return (
        events.withColumn("ts", F.date_trunc("second", "ts"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )


def session_rows_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 day"
) -> DataFrame:
    """Streaming sessionization: one row per (user, session) via
    ``F.session_window`` — the native form of the batch lag+flag+sum
    sessionization in events_sessions.

    Note the boundary semantics: session_window extends a session to
    ``last_event + gap`` with an EXCLUSIVE end, so an event exactly
    ``gap`` after its predecessor starts a NEW session — equivalent to
    the batch twin's ``diff > 1800`` rule only when no gap is exactly
    1800 s (asserted true for the test data in tests/test_streaming.py).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_stream_once(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain all available input through the streaming plan into an
    in-memory table (availableNow trigger) and return it as a batch
    DataFrame — the test harness for stream/batch parity.  Aggregating
    plans use the default complete mode; non-aggregating plans
    (e.g. streaming dedup) need ``output_mode="append"``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def histogram_sketch_stream(
    events: DataFrame,
    watermark: str = "1 day",
    lo: float | None = None,
    w: float | None = None,
    nbins: int | None = None,
) -> DataFrame:
    """Streaming maintenance of the daily fixed-bin histogram sketch
    (operators/sketches.py::histogram_sketch): the same clamped-bin
    expression grouped by (1-day window, event_type, bin).

    This is the lambda-free form of the sketch-rollup pattern: the
    stream keeps the finest-grain sketch current (state = one count
    row per (day, type, bin) inside the watermark horizon — at most
    days × types × nbins rows, independent of event volume), and any
    batch quantile query (histogram_quantiles) runs over the
    continuously-maintained sketch table instead of rescanning facts.
    Count updates are additions, so a late event inside the watermark
    lands in its bin exactly as the batch build would place it.  The
    bin expression and spec defaults are IMPORTED from the batch
    sketch (operators/sketches.py::bin_col / HIST_*) so the streamed
    state can never drift from what histogram_quantiles expects."""
    from ..operators.sketches import HIST_LO, HIST_NBINS, HIST_W, bin_col

    b = bin_col(
        "value",
        HIST_LO if lo is None else lo,
        HIST_W if w is None else w,
        HIST_NBINS if nbins is None else nbins,
    )
    return (
        events.where(F.col("value").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 day").alias("d"), "event_type", b.alias("bin")
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("d.start").cast("date").alias("day"),
            "event_type",
            "bin",
            "n",
        )
    )


def cms_user_sketch_stream(
    events: DataFrame,
    watermark: str = "1 day",
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Streaming maintenance of the daily Count-Min user-frequency
    sketch (operators/sketches.py::daily_cms_user_sketch): each event
    increments its user's d grid counters inside the day window.

    Same lambda-free contract as histogram_sketch_stream: state is one
    count row per (day, r, b) inside the watermark horizon — at most
    days × depth × width rows, INDEPENDENT of event volume and of the
    number of distinct users (the whole point of sketching heavy-user
    detection: per-user streaming state would be unbounded).  Counter
    updates are additions, so the drained stream equals the batch grid
    bit for bit and merges to coarser grains by (r, b) addition; the
    hash rows are the batch operator's own cms_hash_cols, so streamed
    state can never drift from what batch point queries expect."""
    from ..operators.sketches import CMS_DEPTH, CMS_WIDTH, cms_hash_cols

    d = CMS_DEPTH if depth is None else depth
    w = CMS_WIDTH if width is None else width
    cells = F.posexplode(
        F.array(*cms_hash_cols(F.col("user_id").cast("string"), d, w))
    )
    return (
        events.select("ts", cells.alias("r", "b"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("dw"), "r", "b")
        .agg(F.count("*").alias("n"))
        .select(F.col("dw.start").cast("date").alias("day"), "r", "b", "n")
    )


def daily_user_sketch_stream(
    events: DataFrame, watermark: str = "1 day", lg_k: int | None = None
) -> DataFrame:
    """Streaming maintenance of the daily HLL distinct-user sketch
    (operators/sketches.py::daily_user_sketches) — the third sketch
    family streamed (histogram = quantiles, CMS = frequencies, HLL =
    distinct counts).

    HLL register updates are max() operations, so the drained stream's
    sketch BYTES equal the batch build's for the same input multiset
    (the order/partitioning-insensitivity already asserted for the
    batch sketch carries over to micro-batched arrival); coarser
    grains merge with hll_union_agg over the maintained daily rows,
    never rescanning events.  State is one register array per day
    inside the watermark horizon — independent of event volume and of
    distinct-user count."""
    from ..operators.sketches import LG_K

    k = LG_K if lg_k is None else lg_k
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("d"))
        .agg(F.hll_sketch_agg("user_id", F.lit(k)).alias("sketch"))
        .select(
            F.col("d.start").cast("date").alias("day"),
            "sketch",
            F.hll_sketch_estimate("sketch").alias("est_users"),
        )
    )


def bloom_filter_stream(
    events: DataFrame,
    key_col: str = "user_id",
    m_bits: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """Streaming maintenance of a Bloom filter over every key ever
    seen (operators/bloom.py) — the FOURTH sketch family streamed
    (histogram = quantiles, CMS = frequencies, HLL = distinct counts,
    Bloom = membership): an ingestion pipeline keeps the filter
    current so downstream jobs prune scans against it
    (bloom_might_contain) without ever rescanning the key history.

    Bit-OR is the whole update, so the sketch-maintenance contract is
    the strongest of the four: NO watermark and NO eviction needed —
    state is one row per SET 64-bit word, ≤ m_bits/64 rows
    (16,384 at the default m) FOREVER, independent of volume AND of
    distinct-key count, and monotone (a drained grid always equals the
    batch build over everything ingested — asserted bit-exactly in
    tests/test_streaming.py alongside the other three).

    Emits the sparse ``(w, word)`` grid (complete mode); densify with
    :func:`operators.bloom.bloom_densify` when a probe-ready array is
    needed."""
    from ..operators.bloom import BLOOM_K, BLOOM_M_BITS, _positions

    m = BLOOM_M_BITS if m_bits is None else m_bits
    kk = BLOOM_K if k is None else k
    return (
        events.select(
            F.explode(_positions(F.col(key_col), m, kk)).alias("pos")
        )
        .select(
            F.shiftright(F.col("pos"), 6).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )

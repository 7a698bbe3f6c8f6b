"""applyInPandasWithState: state must ACCUMULATE across micro-batches
— two copies of the events file driven one-per-trigger; the final
update per user equals the batch aggregate over both copies."""

from __future__ import annotations

import shutil

import pandas as pd
from pyspark.sql import functions as F

from recsys_spark_spark.sources.readers import table
from recsys_spark_spark.streaming.stateful import running_user_totals_stream
from recsys_spark_spark.streaming.windows import read_events_stream


def test_state_accumulates_across_microbatches(spark, sf_dir, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events_a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src / "events_b.parquet")

    events = read_events_stream(
        spark, str(src), max_files_per_trigger=1, glob="events_*.parquet"
    )
    stream = running_user_totals_stream(events)

    updates: list[pd.DataFrame] = []

    def sink(batch_df, batch_id):
        updates.append(batch_df.toPandas())

    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    nonempty = [u for u in updates if len(u)]
    assert len(nonempty) >= 2, "expected at least two micro-batches"
    last = {}
    for pdf in updates:
        for r in pdf.itertuples(index=False):
            last[r.user_id] = (r.n_events, round(r.sum_value, 6))

    e = table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (2 * r["n"], round(2 * r["s"], 6))
        for r in e.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert last == want

"""r9 scale probe for batch sessionization (events_sessions): the
window's 100 TB hazard is not volume — it is a HOT USER, because
``Window.partitionBy(user_id)`` sorts each user's whole timeline in
ONE task.  Two 5M-event runs with identical totals:

  uniform:  100,000 users × 50 events;
  hot-key:  one user with 2,000,000 events + 60,000 users × 50.

Event layout is closed-form (groups of 5 events 60 s apart, groups
1 h apart → n_sessions = ceil(n_events / 5) exactly), so both runs
are value-verified, and the wall-clock gap isolates the straggler
cost.  The mitigation story is already shipped: events_key_skew_audit
reports exactly this key's skew_ratio BEFORE a pipeline pays for the
window (its row for the hot run is printed here), and at 100 TB a
hot-user timeline is pre-chunked by coarse time block (sessionize per
block, merge boundary sessions) — the audit is what tells you the
chunking is needed.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    # the mega-hot probe pushes 10M rows through 32 concurrent window
    # tasks; the 1g default heap OOMs in the per-chunk aggregate
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from recsys_spark_spark.plans.relational import events_sessions

T0 = "2024-01-01 00:00:00"


def gen(path: str, specs: list[tuple[int, int, int]]) -> int:
    """specs: (n_users, events_per_user, user_id_base); event k of a
    user sits at (k//5)·3600 + (k%5)·60 seconds — 5-event sessions,
    1 h apart → exactly ceil(n/5) sessions per user."""
    frames = []
    for n_users, per_user, base in specs:
        frames.append(
            spark.range(n_users * per_user).select(
                (F.lit(base) + F.col("id") % n_users).alias("user_id"),
                (F.col("id") / n_users).cast("long").alias("k"),
            )
        )
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)
    (
        df.select(
            F.monotonically_increasing_id().alias("event_id"),
            "user_id",
            (
                F.to_timestamp(F.lit(T0))
                + F.make_interval(
                    secs=(
                        (F.col("k") / 5).cast("long") * 3600
                        + (F.col("k") % 5) * 60
                    ).cast("double")
                )
            ).alias("ts"),
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        .write.mode("overwrite")
        .parquet(f"{path}/events.parquet")
    )
    return sum(u * p for u, p, _ in specs)


runs = {
    "warm": [(10_000, 50, 0)],  # JIT/codegen warmup, not compared
    "uniform": [(100_000, 50, 0)],
    "hotkey": [(1, 2_000_000, 10_000_000), (60_000, 50, 0)],
}
walls = {}
for tag, specs in runs.items():
    path = f"/tmp/stress_sessions_{tag}"
    n = gen(path, specs)
    t0 = time.perf_counter()
    out = events_sessions(spark, path)
    agg = out.agg(
        F.sum("n_sessions").alias("s"), F.sum("n_events").alias("e")
    ).collect()[0]
    walls[tag] = time.perf_counter() - t0
    exp_sessions = sum(u * -(-p // 5) for u, p, _ in specs)
    print(
        f"{tag}: {n} events -> {walls[tag]:.2f}s; sessions {agg['s']} "
        f"(expect {exp_sessions}), events {agg['e']}",
        flush=True,
    )
    assert agg["e"] == n and agg["s"] == exp_sessions
walls.pop("warm")

print(
    f"hot-key / uniform wall ratio = {walls['hotkey'] / walls['uniform']:.2f} "
    f"(same 5M rows; the gap is one task sorting the 2M-event user)",
    flush=True,
)

# the shipped observability: the skew audit flags the hot user BEFORE
# a pipeline pays for the window
from recsys_spark_spark.plans.relational import events_key_skew_audit

row = [
    r
    for r in events_key_skew_audit(
        spark, "/tmp/stress_sessions_hotkey"
    ).collect()
    if r["key_col"] == "user_id"
][0]
print(
    f"skew audit on the hot run: hot_key={row['hot_key']} "
    f"max_key_rows={row['max_key_rows']} skew_ratio={row['skew_ratio']}",
    flush=True,
)
assert row["max_key_rows"] == 2_000_000

# the shipped mitigation: bounded-task chunked sessionization (the
# hot user's 2M events span ~16,700 day-chunks of ~120 events, so no
# task sorts more than one user-day) — must match the plain form
# exactly and erase the straggler
from recsys_spark_spark.plans.relational import events_sessions_chunked

t0 = time.perf_counter()
out_c = events_sessions_chunked(spark, "/tmp/stress_sessions_hotkey")
agg_c = out_c.agg(
    F.sum("n_sessions").alias("s"), F.sum("n_events").alias("e")
).collect()[0]
wall_c = time.perf_counter() - t0
exp_sessions = 1 * -(-2_000_000 // 5) + 60_000 * -(-50 // 5)
assert agg_c["s"] == exp_sessions and agg_c["e"] == 5_000_000
print(
    f"chunked twin on the hot run: {wall_c:.2f}s vs plain "
    f"{walls['hotkey']:.2f}s ({walls['hotkey'] / wall_c:.2f}x), sessions "
    f"exact ({agg_c['s']})",
    flush=True,
)

# crossover probe: ONE 10M-event user — the regime where the plain
# form's single sort task dominates the whole stage and the chunked
# twin's bounded tasks win outright
n_mega = 10_000_000
gen("/tmp/stress_sessions_mega", [(1, n_mega, 42)])
exp_mega = -(-n_mega // 5)
mega = {}
for tag, fn in [("plain", events_sessions), ("chunked", events_sessions_chunked)]:
    t0 = time.perf_counter()
    agg_m = (
        fn(spark, "/tmp/stress_sessions_mega")
        .agg(F.sum("n_sessions").alias("s"), F.sum("n_events").alias("e"))
        .collect()[0]
    )
    mega[tag] = time.perf_counter() - t0
    assert agg_m["s"] == exp_mega and agg_m["e"] == n_mega
    print(f"mega-hot {tag}: {mega[tag]:.2f}s (sessions exact)", flush=True)
print(
    f"mega-hot (one 10M-event user) plain/chunked = "
    f"{mega['plain'] / mega['chunked']:.2f}x",
    flush=True,
)
spark.stop()

"""Mergeable distinct-count sketches (HyperLogLog) — the 100 TB
pattern for COUNT(DISTINCT) rollups.

An exact distinct count over 100 TB shuffles every key once per
grouping grain; a sketch column is aggregated ONCE at the finest grain
(one fixed-size register array per group, map-side combinable) and
every coarser rollup — weekly, monthly, whole-corpus — is a
register-max MERGE of the stored sketches, no rescan of the facts.  Spark ships the
Apache DataSketches HLL implementation as built-in aggregates
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``),
so the whole pattern stays JVM-side and deterministic:

- HLL register updates are max() operations → order- and
  partitioning-insensitive: the same input multiset yields the SAME
  sketch bytes and estimate on any cluster layout (asserted in
  tests/test_sketches.py);
- merge is associative: estimating a union of daily sketches equals
  estimating one sketch built over the union of the days' rows,
  EXACTLY — the mergeability contract the rollup pattern rests on;
- the registers are engine-specific, so there is no cross-engine
  DuckDB value-hash oracle by nature; accuracy is property-tested
  instead (relative error vs exact distinct ≤ ~3/√2^lgk).

No reference counterpart (the reference has no approximate
aggregates); slots into the driver-mandated extension family
(SURVEY §2.12) next to approx_count_distinct's one-shot form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 2^12 = 4096 registers ≈ 1.6% standard error — the DataSketches
#: default; each +1 doubles sketch bytes and tightens error by √2.
LG_K = 12


def daily_user_sketches(
    events: DataFrame,
    lg_k: int = LG_K,
) -> DataFrame:
    """One row per day: an HLL sketch of the day's distinct users plus
    the day's estimate.  The ``sketch`` column is the mergeable
    artifact a warehouse would persist next to the daily partition —
    coarser grains never rescan events."""
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch"),
        )
        .select(
            "day",
            "sketch",
            F.hll_sketch_estimate("sketch").alias("est_users"),
        )
    )


def rollup_sketches(daily: DataFrame) -> DataFrame:
    """Merge persisted daily sketches to the total grain: one
    register-max union, O(days × sketch bytes) — never the fact table.
    Returns a single row ``(est_users_total)``."""
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "est_users_total"
        )
    )

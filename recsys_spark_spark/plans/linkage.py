"""Record linkage: edit-distance-1 fuzzy self-join via symmetric
deletion neighborhoods (SymSpell lineage).

The naive fuzzy join is all-pairs × levenshtein — O(n²) and dead at
scale.  The symmetric-delete trick makes it an equi-join: two strings
within edit distance 1 share at least one member of their
delete-1 neighborhoods ({s} ∪ {s minus one char}), because a
substitution at position i means both sides deleted position i, an
insertion/deletion means one side's original equals the other's
deletion.  So: expand each distinct name to ≤ len+1 variants
(row-local), equi-join on the variant (inverted-index shape, the same
as MinHash banding), then verify the BOUNDED candidate set with exact
``levenshtein`` — a built-in in both Spark and DuckDB, so unlike most
fuzzy-match stacks the whole pipeline carries a value-hash oracle.

Scale: candidates per bucket are names sharing a variant —
``max_bucket`` caps degenerate buckets (very hot variants, e.g.
single-char names) exactly like the LSH ``max_bucket`` guard; a
provable no-op on this data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import table
from .registry import register, register_demoted

#: drop deletion-variant buckets larger than this before the pair
#: join (hot-bucket guard, same idiom as operators/knn.py max_bucket)
MAX_BUCKET = 1000


@register_demoted(
    # new in r4 (registry window full at 50); rotate REGISTERED in r5
    "customer_name_fuzzy_pairs",
    oracle=f"""
WITH n AS (SELECT DISTINCT c_name AS name FROM customer),
d0 AS (
  SELECT name, substr(name, 1, i - 1) || substr(name, i + 1) AS variant
  FROM n, unnest(range(1, length(name) + 1)) AS t(i)
  UNION
  SELECT name, name FROM n
),
bsz AS (
  SELECT variant FROM d0 GROUP BY variant
  HAVING count(*) <= {MAX_BUCKET}
),
d AS (SELECT d0.* FROM d0 JOIN bsz USING (variant)),
p AS (
  SELECT a.name AS name_a, b.name AS name_b
  FROM d a JOIN d b ON a.variant = b.variant AND a.name < b.name
  GROUP BY 1, 2
)
SELECT name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
FROM p WHERE levenshtein(name_a, name_b) <= 1
""",
)
def customer_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer-name pairs within edit distance 1 (see module
    docstring for the symmetric-delete construction).  The synthetic
    names differ in digits, so single-digit-substitution pairs
    genuinely exist — the oracle value-checks candidate generation,
    bucketing, and the exact verify on ~20k real pairs."""
    names = table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name")
    )
    return fuzzy_pairs(names)


def name_variant_rows(names: DataFrame, name_col: str = "name") -> DataFrame:
    """(name, variant): each distinct name plus its delete-1 variants
    (symmetric-delete candidate keys) via a row-local transform over
    the position sequence (expr form: substr's position args take the
    lambda var).  Shared by :func:`fuzzy_pairs` and the cap-drop audit
    (plans/caps.py), so the audited bucket population is the one the
    pair join buckets on."""
    n = names.select(F.col(name_col).alias("name")).distinct()
    return n.select(
        "name",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("name")),
                    F.expr(
                        "transform(sequence(1, length(name)), "
                        "k -> concat(substr(name, 1, k - 1), "
                        "substr(name, k + 1, length(name))))"
                    ),
                )
            )
        ).alias("variant"),
    )


def fuzzy_pairs(
    names: DataFrame,
    name_col: str = "name",
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Library form over any single-column name relation; returns
    (name_a, name_b, dist) with dist ≤ 1, name_a < name_b."""
    d = name_variant_rows(names, name_col)
    bsz = (
        d.groupBy("variant")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") <= max_bucket)
        .select("variant")
    )
    d = d.join(bsz, "variant")
    a = d.alias("a")
    b = d.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.variant") == F.col("b.variant"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return p.where(dist <= 1).select(
        "name_a", "name_b", dist.cast("int").alias("dist")
    )


# --- multi-pass blocked ER (r12) ----------------------------------------------
#: edit-distance budget for the blocked ER query (the delete-1 op
#: above handles d=1 exactly; blocking is how production systems reach
#: d=2 without the O(len²) delete-2 neighborhood explosion)
ER_MAX_DIST = 2

#: positional segments over c_name's 9-digit suffix ('Customer#' is 9
#: chars, digits at 10..18): d+1 = 3 segments of 3 — the pigeonhole
#: guarantees equal-length substitution-noise pairs share >= 1 segment
ER_SEGMENTS = [(10, 3), (13, 3), (16, 3)]

_ER_BLOCK_SQL = "\n  UNION ALL ".join(
    f"SELECT 'seg{i}' AS pass, substr(name, {p}, {w}) AS bk, name FROM n"
    for i, (p, w) in enumerate(ER_SEGMENTS, 1)
)


@register_demoted(
    "customer_name_er_matches",
    oracle=f"""
WITH n AS (SELECT DISTINCT c_name AS name FROM customer),
b0 AS (
  {_ER_BLOCK_SQL}
),
keep AS (SELECT pass, bk FROM b0 GROUP BY 1, 2 HAVING count(*) <= {MAX_BUCKET}),
b AS (SELECT b0.* FROM b0 JOIN keep USING (pass, bk)),
cand AS (
  SELECT DISTINCT a.name AS name_a, c.name AS name_b
  FROM b a JOIN b c ON a.pass = c.pass AND a.bk = c.bk AND a.name < c.name
),
pairs AS (
  SELECT name_a, name_b, levenshtein(name_a, name_b) AS dist
  FROM cand WHERE levenshtein(name_a, name_b) <= {ER_MAX_DIST}
),
sym AS (
  SELECT name_a AS name, name_b AS other, dist FROM pairs
  UNION ALL
  SELECT name_b AS name, name_a AS other, dist FROM pairs
),
best AS (
  SELECT name, CAST(count(*) AS BIGINT) AS n_matches,
         max(CASE WHEN rn = 1 THEN other END) AS best_match,
         CAST(max(CASE WHEN rn = 1 THEN dist END) AS INTEGER) AS best_dist
  FROM (
    SELECT name, other, dist, row_number() OVER (
             PARTITION BY name ORDER BY dist ASC, other ASC) AS rn
    FROM sym
  ) GROUP BY 1
)
SELECT n.name, CAST(coalesce(b.n_matches, 0) AS BIGINT) AS n_matches,
       b.best_match, b.best_dist
FROM n LEFT JOIN best b ON b.name = n.name
""",
)
def customer_name_er_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTITY RESOLUTION via the multi-pass blocked fuzzy join
    (``operators/blocking.py`` — the r12 frontier operator): per
    customer name, how many other names sit within edit distance
    {ER_MAX_DIST} (typo-noise duplicates), and the closest one —
    blocking on 3 positional digit segments (the d+1-segment
    pigeonhole), hot blocks capped at MAX_BUCKET and AUDITED
    (blocked_cap_audit; the all-names '000' head segment IS dropped
    at every test scale — the drop is visible, the recall cost
    measured at 0.92 pair-recall vs exact ED<=2,
    tests/test_blocking.py).  Output is the BOUNDED per-entity
    summary (|names| rows) a downstream merge consumes, not the dense
    pair listing.

    Scale shape: candidates <= max_block x n x n_passes — LINEAR in
    rows at fixed cap.  Measured (stress/blocked_join_stress.py,
    realistic ER corpus: entity clusters with planted 2-substitution
    typos): the naive all-pairs join is plainly quadratic and dead at
    40k names (49 s -> 154 s -> 517 s for 10k/20k/40k) while the
    blocked join runs 500k/1M/2M names in 12-16 s FLAT with zero
    planted pairs lost (anti-join-asserted, not sampled).  At this
    query's sf0.1 the synthetic sequential IDs pile blocks at the cap
    (7.6M candidates) and the thresholded-levenshtein verify is the
    measured cost — plan notes in blocked_fuzzy_pairs.  No reference
    analogue (SURVEY §2 extension — the linkage family's scale
    path)."""
    from ..operators.blocking import blocked_fuzzy_pairs, er_match_summary

    names = table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name")
    ).distinct()
    passes = [
        (f"seg{i}", F.substring(F.col("name"), p, w))
        for i, (p, w) in enumerate(ER_SEGMENTS, 1)
    ]
    pairs = blocked_fuzzy_pairs(
        names, "name", passes, max_dist=ER_MAX_DIST, max_block=MAX_BUCKET
    )
    return er_match_summary(names, pairs, "name")

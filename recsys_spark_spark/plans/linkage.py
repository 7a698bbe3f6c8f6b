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

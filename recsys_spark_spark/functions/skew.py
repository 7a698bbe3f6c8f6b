"""Skew-mitigation utilities (SURVEY §4 'partitioning / shuffle
control'): explicit key salting for joins whose hot keys overwhelm a
single shuffle partition.

AQE's skew-join handling (on in session.py) splits oversized
partitions of sort-merge joins automatically; explicit salting is the
tool for the cases AQE can't fix — hot keys inside a single
aggregation, or broadcast-ineligible joins with pathological key
distributions."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left``'s hot keys are spread over ``n_salts``
    shuffle partitions.

    left gets a random-ish (hash-derived, deterministic) salt in
    [0, n_salts); right is replicated n_salts times with every salt
    value, so each (key, salt) bucket joins correctly.  Use when
    ``right`` is too big to broadcast but small enough to replicate
    n_salts×; results are identical to a plain join.
    """
    if how not in ("inner", "left"):
        # right/full outer would emit unmatched RIGHT rows once per
        # replica — semantics only hold left-to-right
        raise ValueError("salted_join supports how='inner' or 'left'")
    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns if c != key]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(
            f"salted_join: non-key column(s) {sorted(overlap)} exist on "
            "both sides — the post-join projection would be ambiguous; "
            "rename or drop them on one side first"
        )
    if "_salt" in lcols or "_salt" in rcols:
        raise ValueError(
            "salted_join: '_salt' is reserved for the salting key; "
            "rename the existing column first"
        )
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), n_salts)
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    joined = l.join(r, [key, "_salt"], how)
    return joined.select(*lcols, *rcols)

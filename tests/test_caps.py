"""Cap-drop observability audit (plans/caps.py) — r8 VERDICT
what's-missing #3: the capped candidate generators must SURFACE what
they drop, value-checked, not just document the recall consequence.

Oracle parity for the registered-tier-eligible ``dedup_cap_audit``
query rides tests/test_oracle_parity.py like every oracled query; here
we pin the histogram arithmetic and the planted-over-cap behavior the
shipped corpus cannot exercise (its caps are inactive — which the
audit itself certifies with all-zero over_cap rows)."""

from pyspark.sql import functions as F

from recsys_spark_spark.operators.multimodal import dhash_chunk_rows
from recsys_spark_spark.plans.caps import cap_histogram, dedup_cap_audit


def test_cap_histogram_planted_over_cap(spark):
    """Synthetic bucket-size relation with sizes straddling the cap:
    the over-cap size classes flag over_cap=1 and carry exactly the
    item/pair mass the generator would drop."""
    sizes = spark.createDataFrame(
        [(1,)] * 5 + [(3,)] * 2 + [(10,)] + [(7,)], "bsz long"
    )
    rows = {
        r["bucket_size"]: r
        for r in cap_histogram(sizes, "g", cap=5).collect()
    }
    assert set(rows) == {1, 3, 10, 7}
    assert all(r["generator"] == "g" and r["cap"] == 5 for r in rows.values())
    # size 1: 5 buckets, no pairs, under cap
    assert (rows[1]["n_buckets"], rows[1]["n_pairs"], rows[1]["over_cap"]) == (5, 0, 0)
    # size 3: 2 buckets × C(3,2)=3 pairs
    assert (rows[3]["n_buckets"], rows[3]["n_items"], rows[3]["n_pairs"]) == (2, 6, 6)
    assert rows[3]["over_cap"] == 0
    # size 10 > cap: C(10,2)=45 candidate pairs would be dropped
    assert (rows[10]["n_items"], rows[10]["n_pairs"], rows[10]["over_cap"]) == (10, 45, 1)
    assert (rows[7]["n_pairs"], rows[7]["over_cap"]) == (21, 1)


def test_cap_histogram_uncapped_pins_null_cap(spark):
    """cap=None (an uncapped generator, e.g. the MinHash bands) pins
    cap NULL and over_cap 0 on every row — the histogram alone is the
    deliverable."""
    sizes = spark.createDataFrame([(1,), (1000,)], "bsz long")
    rows = cap_histogram(sizes, "g", cap=None).collect()
    assert all(r["cap"] is None and r["over_cap"] == 0 for r in rows)


def test_dhash_chunk_audit_flags_flat_corpus(spark):
    """Planted hot-chunk mass (the low-texture collapse from the r8
    near-pairs test): ten identical fingerprints put every chunk
    bucket over a cap of 4, and the audit reports the exact dropped
    bucket/pair volume the capped generator would lose."""
    rows = [(i, "0" * 64) for i in range(1, 11)]  # 10-deep flat mass
    rows += [(20, "1" * 64)]  # lone cold fingerprint
    hashed = spark.createDataFrame(rows, "id long, dhash string")
    sizes = dhash_chunk_rows(hashed).groupBy("c", "chunk").agg(
        F.count("*").alias("bsz")
    )
    hist = {
        r["bucket_size"]: r
        for r in cap_histogram(sizes, "dhash_chunk", cap=4).collect()
    }
    # 4 chunk buckets of the flat mass (one per chunk position), each
    # holding all 10 hashes → over cap, C(10,2)=45 pairs dropped each
    assert hist[10]["n_buckets"] == 4
    assert hist[10]["n_pairs"] == 4 * 45
    assert hist[10]["over_cap"] == 1
    # the cold fingerprint's 4 singleton buckets are under cap
    assert hist[1]["n_buckets"] == 4
    assert hist[1]["over_cap"] == 0


def test_dedup_cap_audit_caps_inactive_on_shipped_corpus(spark, sf_dir):
    """On the shipped corpus every capped generator's buckets sit
    under its cap (the audit's all-clear reading), every generator
    reports at least one size class, and the per-size arithmetic
    n_items = size · n_buckets holds on every row."""
    rows = dedup_cap_audit(spark, sf_dir).collect()
    gens = {r["generator"] for r in rows}
    assert gens == {"dhash_chunk", "fuzzy_variant", "minhash_band", "cf_item_raters"}
    assert all(r["over_cap"] == 0 for r in rows)
    assert all(
        r["n_items"] == r["bucket_size"] * r["n_buckets"] for r in rows
    )
    caps = {r["generator"]: r["cap"] for r in rows}
    assert caps["dhash_chunk"] == 64
    assert caps["fuzzy_variant"] == 1000
    assert caps["minhash_band"] is None
    assert caps["cf_item_raters"] == 500

"""Incremental dedup against a stored corpus (operators/incremental.py):
planted-fixture match semantics, the append-replay idempotence
contract, non-vacuity on the real corpus, and the store round-trip.
Oracle parity of the registered dedup_incremental query runs in
test_oracle_parity.py like every oracled row."""

from __future__ import annotations

from pyspark.sql import functions as F

from recsys_spark_spark.operators.incremental import (
    MIN_AGREE,
    N_HASHES,
    append_shard_to_store,
    incremental_neardup_matches,
    read_store,
    signature_store_frames,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog again and again today"


def test_planted_dup_matched_and_unrelated_not(spark):
    corpus = _docs(
        spark,
        [
            (1, BASE),
            (2, "completely different words about spark physics and cheese"),
        ],
    )
    # doc 10: one token changed from doc 1 (high Jaccard); doc 11:
    # unrelated text — must come back is_dup 0 with NULL dup_of
    shard = _docs(
        spark,
        [
            (10, BASE.replace("dog", "cat")),
            (11, "unrelated corpus of entirely novel tokens nine eight seven"),
        ],
    )
    sigs, bands = signature_store_frames(corpus)
    out = {
        r["new_id"]: (r["is_dup"], r["dup_of"], r["match_frac"])
        for r in incremental_neardup_matches(shard, sigs, bands).collect()
    }
    assert set(out) == {10, 11}  # every shard doc present
    assert out[10][0] == 1 and out[10][1] == 1
    assert out[10][2] >= MIN_AGREE / N_HASHES
    assert out[11] == (0, None, None)


def test_match_frac_is_exact_agreement_fraction(spark):
    """match_frac must be n_agree/N_HASHES of the SIGNATURES, not a
    recomputed text Jaccard — an identical text matches at 1.0."""
    corpus = _docs(spark, [(1, BASE)])
    shard = _docs(spark, [(10, BASE)])
    sigs, bands = signature_store_frames(corpus)
    [r] = incremental_neardup_matches(shard, sigs, bands).collect()
    assert (r["is_dup"], r["dup_of"], r["match_frac"]) == (1, 1, 1.0)


def test_tie_breaks_to_smallest_store_id(spark):
    corpus = _docs(spark, [(7, BASE), (3, BASE)])  # identical stored twins
    shard = _docs(spark, [(10, BASE)])
    sigs, bands = signature_store_frames(corpus)
    [r] = incremental_neardup_matches(shard, sigs, bands).collect()
    assert r["dup_of"] == 3  # equal agreement -> smallest id wins


def test_append_replay_is_idempotent(spark, tmp_path):
    """The exactly-once contract: re-appending the same shard_id (a
    retried batch) REPLACES its partition — store contents and match
    results are bit-identical to a single append."""
    store = str(tmp_path / "store")
    corpus = _docs(spark, [(1, BASE), (2, "other words entirely here")])
    append_shard_to_store(corpus, store, shard_id=0)
    sigs1 = sorted(
        (r["id"], tuple(r["sig"])) for r in read_store(spark, store)[0].collect()
    )
    append_shard_to_store(corpus, store, shard_id=0)  # the replay
    sigs2 = sorted(
        (r["id"], tuple(r["sig"])) for r in read_store(spark, store)[0].collect()
    )
    assert sigs1 == sigs2 and len(sigs1) == 2
    # and a second shard under its own partition ADDS without touching
    # shard 0
    append_shard_to_store(
        _docs(spark, [(5, "late arriving doc text")]), store, shard_id=1
    )
    sigs3 = read_store(spark, store)[0]
    assert sigs3.count() == 3


def test_store_roundtrip_matches_in_memory_frames(spark, tmp_path):
    """What incremental matching reads back must equal what
    signature_store_frames computed — the storage path adds nothing
    and loses nothing."""
    store = str(tmp_path / "store")
    corpus = _docs(spark, [(1, BASE), (2, "other words entirely here")])
    append_shard_to_store(corpus, store, shard_id=0)
    mem_sigs, mem_bands = signature_store_frames(corpus)
    rd_sigs, rd_bands = read_store(spark, store)
    assert sorted(
        (r["id"], tuple(r["sig"])) for r in mem_sigs.collect()
    ) == sorted((r["id"], tuple(r["sig"])) for r in rd_sigs.collect())
    assert sorted(map(tuple, mem_bands.collect())) == sorted(
        map(tuple, rd_bands.collect())
    )


def test_registered_query_is_nonvacuous(spark, sf_dir):
    """The real corpus must plant near-dup families ACROSS the
    shard/corpus split, or the driver row would certify only the
    no-match path."""
    from recsys_spark_spark.plans.registry import DEMOTED, QUERIES, _load_all

    _load_all()
    fn = {**QUERIES, **DEMOTED}["dedup_incremental"].fn
    out = fn(spark, sf_dir)
    n_dup = out.where("is_dup = 1").count()
    n_all = out.count()
    assert n_all > 0 and 0 < n_dup < n_all
    # dup rows carry a qualifying agreement and a real stored doc id
    bad = out.where(
        (F.col("is_dup") == 1)
        & (
            F.col("dup_of").isNull()
            | (F.col("match_frac") < MIN_AGREE / N_HASHES)
        )
    ).count()
    assert bad == 0


def test_incremental_plan_is_equi_join_not_cartesian(spark):
    """The candidate stage must execute as a hash/merge EQUI-join on
    (band, bsig) — a planner fallback to a nested-loop join would
    reintroduce the shard x corpus scan the store exists to avoid."""
    corpus = _docs(spark, [(i, f"doc number {i} words") for i in range(20)])
    shard = _docs(spark, [(100 + i, f"doc number {i} words") for i in range(3)])
    sigs, bands = signature_store_frames(corpus)
    out = incremental_neardup_matches(shard, sigs, bands)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_ingest_processor_dedups_across_batches(spark, tmp_path):
    """Online ingestion (make_ingest_dedup_processor): batch 1 seeds
    the store; batch 2's near-dup of a batch-1 keeper is flagged and
    NOT appended; batch 3 sees batch 2's novel survivor as store
    content — the growing-store contract."""
    from recsys_spark_spark.operators.incremental import (
        make_ingest_dedup_processor,
    )

    store = str(tmp_path / "store")
    dec = str(tmp_path / "decisions")
    proc = make_ingest_dedup_processor(store, dec)

    proc(_docs(spark, [(1, BASE), (2, "totally other text here now")]), 0)
    proc(_docs(spark, [(10, BASE.replace("dog", "cat")), (11, "novel words for batch two arriving")]), 1)
    proc(_docs(spark, [(20, "novel words for batch two arriving")]), 2)

    d = {
        r["new_id"]: (r["batch_id"], r["is_dup"], r["dup_of"])
        for r in spark.read.parquet(dec).collect()
    }
    assert d[1] == (0, 0, None) and d[2] == (0, 0, None)  # seed batch all new
    assert d[10] == (1, 1, 1)  # near-dup of batch-1 keeper
    assert d[11] == (1, 0, None)
    assert d[20] == (2, 1, 11)  # exact dup of batch-2 SURVIVOR
    # store holds exactly the keepers
    ids = {r["id"] for r in spark.read.parquet(f"{store}/sigs").collect()}
    assert ids == {1, 2, 11}


def test_ingest_processor_replay_is_exactly_once(spark, tmp_path):
    """The planted replay hazard: after batch 1 appended its survivor,
    a REPLAY of batch 1 must match against the pre-batch store only —
    without the shard_id exclusion the replayed doc would near-dup
    ITSELF and flip its decision from kept to duplicate."""
    from recsys_spark_spark.operators.incremental import (
        make_ingest_dedup_processor,
    )

    store = str(tmp_path / "store")
    dec = str(tmp_path / "decisions")
    proc = make_ingest_dedup_processor(store, dec)
    proc(_docs(spark, [(1, BASE)]), 0)
    proc(_docs(spark, [(10, "fresh unrelated batch one text")]), 1)

    def snapshot():
        return (
            sorted(map(tuple, spark.read.parquet(dec).collect())),
            sorted(
                (r["id"], r["shard_id"])
                for r in spark.read.parquet(f"{store}/sigs").collect()
            ),
        )

    before = snapshot()
    proc(_docs(spark, [(10, "fresh unrelated batch one text")]), 1)  # replay
    assert snapshot() == before  # decisions AND store bit-identical
    d = {r["new_id"]: r["is_dup"] for r in spark.read.parquet(dec).collect()}
    assert d[10] == 0  # still kept — never matched itself


def test_bucket_counts_hot_set_equals_band_table_aggregate(spark, tmp_path):
    """The store's pre-combined bcounts relation must yield the SAME
    hot set as re-counting the band table — bucket hotness sums
    across shard partitions (planted: one bucket goes over-cap only
    when both shards' counts combine)."""
    from recsys_spark_spark.operators.incremental import (
        read_store_bucket_counts,
        store_hot_buckets,
    )

    store = str(tmp_path / "store")
    # two shards of identical texts: each shard's buckets hold 3 rows,
    # combined 6 — over a cap of 5 only ACROSS shards
    batch = [(i, BASE) for i in range(3)]
    append_shard_to_store(_docs(spark, batch), store, shard_id=0)
    append_shard_to_store(
        _docs(spark, [(10 + i, BASE) for i in range(3)]), store, shard_id=1
    )
    _, bands = read_store(spark, store)
    bcounts = read_store_bucket_counts(spark, store)
    assert bcounts is not None
    from_counts = sorted(
        map(tuple, store_hot_buckets(bands, 5, bcounts).collect())
    )
    from_bands = sorted(map(tuple, store_hot_buckets(bands, 5).collect()))
    assert from_counts == from_bands and len(from_counts) > 0


def test_bcounts_fallback_only_on_verified_absence(spark, tmp_path):
    """r13 VERDICT wrong #1 / ADVICE: the legacy-layout fallback must
    trigger ONLY when bcounts/ verifiably does not exist; a PRESENT
    but unreadable bcounts relation must raise, not silently demote
    every future shard match to the band-table recount path."""
    import os

    import pytest

    from recsys_spark_spark.operators.incremental import (
        read_store_bucket_counts,
    )

    store = str(tmp_path / "store")
    append_shard_to_store(_docs(spark, [(1, BASE)]), store, shard_id=0)
    # genuine legacy layout: bcounts absent -> None (the one fallback)
    import shutil

    shutil.rmtree(f"{store}/bcounts")
    assert read_store_bucket_counts(spark, store) is None
    # corrupt relation: directory exists, content is not parquet
    os.makedirs(f"{store}/bcounts/shard_id=0", exist_ok=True)
    with open(f"{store}/bcounts/shard_id=0/part-00000.parquet", "w") as f:
        f.write("this is not a parquet file")
    with pytest.raises(Exception):
        read_store_bucket_counts(spark, store).collect()


def test_ingest_processor_corrupt_store_fails_loudly(spark, tmp_path):
    """A present-but-unreadable store must FAIL the batch (the
    checkpoint will replay it) — the old catch-all classified any
    read failure as 'no store yet' and let every duplicate through
    with is_dup=0, permanently, in a component advertised as
    exactly-once."""
    import glob
    import pytest

    from recsys_spark_spark.operators.incremental import (
        make_ingest_dedup_processor,
    )

    store = str(tmp_path / "store")
    dec = str(tmp_path / "decisions")
    proc = make_ingest_dedup_processor(store, dec)
    proc(_docs(spark, [(1, BASE)]), 0)
    # corrupt every sigs data file in place
    for p in glob.glob(f"{store}/sigs/shard_id=0/*.parquet"):
        with open(p, "w") as f:
            f.write("garbage, not parquet")
    with pytest.raises(Exception):
        proc(_docs(spark, [(10, BASE)]), 1)
    # and the duplicate was NOT silently admitted as new
    decided = spark.read.parquet(dec).where(F.col("batch_id") == 1).count()
    assert decided == 0


def test_ingest_processor_partial_first_append_reseeds(spark, tmp_path):
    """Crash-mid-first-append hazard: sigs/ written but bands/ never
    created.  The replayed seed batch must detect 'no usable store'
    and seed again — not wedge forever on reading a never-created
    bands/ directory."""
    import shutil

    from recsys_spark_spark.operators.incremental import (
        make_ingest_dedup_processor,
    )

    store = str(tmp_path / "store")
    dec = str(tmp_path / "decisions")
    proc = make_ingest_dedup_processor(store, dec)
    proc(_docs(spark, [(1, BASE)]), 0)
    shutil.rmtree(f"{store}/bands")  # simulate the partial first append
    proc(_docs(spark, [(1, BASE)]), 0)  # replay of the seed batch
    d = {r["new_id"]: r["is_dup"] for r in spark.read.parquet(dec).collect()}
    assert d == {1: 0}
    assert spark.read.parquet(f"{store}/bands").count() > 0  # re-seeded


def test_ingest_processor_string_ids_keep_schema_stable(spark, tmp_path):
    """r13 ADVICE: with a non-bigint id column the empty-store branch
    must derive dup_of's type from the id column — a hardcoded bigint
    cast gave decision partitions conflicting parquet schemas across
    batches (batch 0 bigint, batch 1 string) and broke the read-back."""
    from recsys_spark_spark.operators.incremental import (
        make_ingest_dedup_processor,
    )

    def _sdocs(rows):
        return spark.createDataFrame(rows, "doc_id string, text string")

    store = str(tmp_path / "store")
    dec = str(tmp_path / "decisions")
    proc = make_ingest_dedup_processor(store, dec)
    proc(_sdocs([("a1", BASE)]), 0)  # empty-store branch: NULL dup_of
    proc(_sdocs([("b1", BASE), ("b2", "novel second batch text")]), 1)
    out = spark.read.parquet(dec)  # merged read across both partitions
    assert dict(out.dtypes)["dup_of"] == "string"
    d = {r["new_id"]: (r["is_dup"], r["dup_of"]) for r in out.collect()}
    assert d["a1"] == (0, None)
    assert d["b1"] == (1, "a1") and d["b2"] == (0, None)

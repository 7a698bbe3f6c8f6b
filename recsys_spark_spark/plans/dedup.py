"""Near-duplicate detection queries over ``documents`` (SURVEY L2).

Each query is the full operators/dedup.py pipeline with a DuckDB
oracle that REPLAYS the same deterministic hashing — the banding
itself is value-hash checked, not just the verified output.  The
sf0.01 corpus contains 25 planted near-duplicate pairs (3-shingle
Jaccard ≥ 0.9), so these rows are non-vacuous evidence; recall on
synthetic injected duplicates is additionally asserted in
tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import qround
from ..operators.components import components_sql, connected_components
from ..operators.dedup import (
    DUP_WINDOW,
    dedup_cut_docs,
    dedup_cut_sql,
    duplicate_spans,
    duplicate_spans_sql,
    decontaminate_pairs,
    decontaminate_sql,
    minhash_neardup_pairs,
    minhash_neardup_sql,
    ngram_jaccard_pairs,
    ngram_jaccard_sql,
    simhash_fingerprints_sql,
    simhash_neardup_pairs,
    simhash_neardup_sql,
    simhash_signatures,
)
from ..operators.incremental import incremental_neardup_sql
from ..sources.readers import table
from .registry import register, register_demoted

NEARDUP_THRESHOLD = 0.5
MAX_HAMMING = 3

#: bench stage attribution for neardup_components (r8 bench addition:
#: the hottest single stage of corpus_train_ready — MinHash pairs →
#: transitive components — gets its own round-over-round number, so a
#: pair-join regression is attributable without re-deriving it from
#: the composition's stage dict); set on each call, read by bench.py
last_components_timings: dict | None = None


@register(
    "neardup_minhash_lsh",
    bench=True,
    oracle=minhash_neardup_sql(NEARDUP_THRESHOLD),
)
def neardup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 flagship: MinHash banding → bucket join → exact-Jaccard
    verification at τ=0.5.  Detection probability at the planted
    pairs' Jaccard (≥0.9) is 1−4·10⁻⁸ per pair."""
    return minhash_neardup_pairs(
        table(spark, sf_dir, "documents"), threshold=NEARDUP_THRESHOLD
    )


@register("neardup_ngram_jaccard", oracle=ngram_jaccard_sql(NEARDUP_THRESHOLD))
def neardup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact inverted-index n-gram Jaccard near-dup pairs — the
    ground truth the LSH variant approximates."""
    return ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), threshold=NEARDUP_THRESHOLD
    )


#: demo eval split for the decontamination query: every 97th doc
#: plays the held-out benchmark; 4-grams (not the production 8) because
#: the synthetic corpus is short-doc — at sf0.01 the check flags 8
#: genuinely-overlapping train/eval pairs (non-vacuous)
DECONTAM_EVAL_MOD = 97
DECONTAM_N = 4


@register(
    "decontaminate_docs",
    oracle=decontaminate_sql(
        f"doc_id % {DECONTAM_EVAL_MOD} = 0", n=DECONTAM_N, min_shared=1
    ),
)
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination pairs (GPT-3-style n-gram
    decontamination) with every 97th doc as the pretend benchmark.
    Promoted into the round-4 driver window (rotation); oracle parity
    also enforced by pytest, plus an injected-contamination test in
    tests/test_dedup.py."""
    docs = table(spark, sf_dir, "documents")
    evals = docs.where(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
    train = docs.where(F.col("doc_id") % DECONTAM_EVAL_MOD != 0)
    return decontaminate_pairs(train, evals, n=DECONTAM_N, min_shared=1).select(
        "train_id", "eval_id", F.col("shared_shingles").cast("bigint").alias(
            "shared_shingles"
        )
    )


@register("doc_simhash", oracle=simhash_fingerprints_sql())
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprint per document (document
    fingerprinting; the Hamming-space dual of MinHash).  Promoted into
    the round-4 driver window (rotation) so the exact fingerprint
    values earn a driver-green row; neardup_simhash replays the same
    fingerprints inside its pigeonhole join."""
    return simhash_signatures(table(spark, sf_dir, "documents")).select(
        F.col("id").alias("doc_id"), "simhash", "n_tokens"
    )


@register("neardup_simhash", oracle=simhash_neardup_sql(MAX_HAMMING))
def neardup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 3 — exact by
    the 4×15-bit pigeonhole join."""
    return simhash_neardup_pairs(
        table(spark, sf_dir, "documents"), max_hamming=MAX_HAMMING
    )


@register(
    "neardup_components",
    bench=True,
    oracle=f"""
SELECT id AS doc_id,
       CAST(comp AS BIGINT) AS component,
       CAST(CASE WHEN id = comp THEN 1 ELSE 0 END AS BIGINT) AS keeper
FROM ({components_sql(minhash_neardup_sql(NEARDUP_THRESHOLD))}) c
""",
)
def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate GROUPS from the MinHash near-dup pairs —
    the missing last step of a production dedup pipeline (pairs alone
    can't drive deletion: A~B, B~C must share one keeper even though
    A,C were never directly compared).  Spark side: pointer-jumping
    min-label propagation (operators/components.py); oracle: recursive
    CTE reachability.  ``keeper`` = 1 on the component's min doc_id —
    the deterministic survivor."""
    global last_components_timings
    pairs = minhash_neardup_pairs(
        table(spark, sf_dir, "documents"), threshold=NEARDUP_THRESHOLD
    )
    last_components_timings = {}
    comp = connected_components(pairs, timings_out=last_components_timings)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").cast("bigint").alias("component"),
        F.when(F.col("id") == F.col("comp"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("keeper"),
    )


@register_demoted(
    "neardup_dedup_docs",
    oracle=f"""
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (
  SELECT id FROM ({components_sql(minhash_neardup_sql(NEARDUP_THRESHOLD))}) c
  WHERE c.id <> c.comp
)
""",
)
def neardup_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus AFTER transitive near-dup deletion: every document
    that is either untouched by any near-dup pair or the keeper (min
    doc_id) of its duplicate group — the end-to-end composition of
    neardup_components that a training pipeline actually materializes
    (corpus_clean's pair-based rule under-deletes on similarity
    chains; this is the principled variant its docstring points to).
    Demoted tier (driver window full); oracle = anti-join against the
    recursive-CTE components."""
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(docs, threshold=NEARDUP_THRESHOLD)
    comp = connected_components(pairs)
    dropped = comp.where(F.col("id") != F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    return docs.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "doc_duplicate_spans", oracle=duplicate_spans_sql(DUP_WINDOW, 2)
)
def doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-duplication spans (new r5; Lee et al. 2022
    lineage — "Deduplicating Training Data Makes Language Models
    Better"): maximal per-document regions whose every 16-token window
    occurs verbatim in ≥2 distinct documents.  The span-level
    complement of the document-level near-dup family: L2 tools decide
    which DOCUMENT to drop; this marks which TOKENS to cut when the
    documents stay.  Inverted-index shape — linear window relation,
    one fp-keyed aggregate, semi-join back, per-doc island merge — no
    suffix array, no pair join (scale argument in the operator
    docstring); non-vacuous on the shipped corpus (45 of 500 sf0.01
    docs carry a span)."""
    return duplicate_spans(table(spark, sf_dir, "documents"))


@register("doc_dedup_cut", oracle=dedup_cut_sql(DUP_WINDOW, 2))
def doc_dedup_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT half of exact-substring dedup (new r5; Lee et al. 2022
    "remove all but one occurrence"): every document rebuilt with its
    duplicated tokens removed, keeping the lexicographically-smallest
    occurrence per duplicate window; untouched docs pass through
    verbatim.  Output = the full corpus (doc_id, text_clean,
    n_cut_tokens) — the oracle value-hash-checks every rebuilt STRING,
    not just counts (23 of 500 sf0.01 docs lose 1243 tokens)."""
    return dedup_cut_docs(table(spark, sf_dir, "documents"))


#: the corpus_clean oracle's quality formula as a reusable CTE body
#: (plans/pipeline.py keeps the Spark twin in text.quality_exprs)
_QUALITY_CTE = """
quality_scored AS (
  SELECT doc_id,
         floor(least(1.0, greatest(0.0,
               0.3
               + 1.2 * (CAST(len(list_filter(string_split(text, ' '),
                         t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is')))
                         AS DOUBLE) / len(string_split(text, ' ')))
               - 2.0 * (CASE WHEN length(text) > 0 THEN
                         CAST(length(text) -
                         length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
                         AS DOUBLE) / length(text) ELSE 0.0 END)
               + least(CAST(len(string_split(text, ' ')) AS BIGINT), 40)
                   / 200.0)) * 1000000.0 + 0.5) / 1000000.0 AS quality
  FROM documents
)
""".strip()


@register(
    "neardup_group_keepers",
    oracle=f"""
WITH comp AS (
  SELECT * FROM ({components_sql(minhash_neardup_sql(NEARDUP_THRESHOLD))}) _c
),
{_QUALITY_CTE},
ranked AS (
  SELECT c.comp, c.id, q.quality,
         row_number() OVER (
           PARTITION BY c.comp ORDER BY q.quality DESC, c.id ASC) AS rn,
         count(*) OVER (PARTITION BY c.comp) AS n_docs
  FROM comp c JOIN quality_scored q ON q.doc_id = c.id
)
SELECT CAST(comp AS BIGINT) AS group_id,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(id AS BIGINT) AS keep_doc_id,
       quality AS keep_quality
FROM ranked WHERE rn = 1
""",
)
def neardup_group_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keeper election per transitive duplicate group
    (new r5): production pipelines keep the BEST document of each
    near-dup group, not the smallest id — keeper = argmax quality
    (corpus-clean's heuristic score, 6dp-rounded BEFORE ranking so
    the election is cross-engine stable), ties to the smallest
    doc_id.  One row per duplicate group: (group_id = min-id
    component label, n_docs, keep_doc_id, keep_quality).

    Composition: MinHash pairs → distributed pointer-jumping
    components → quality join → per-group rank-1 window; the window
    runs over component members only (tiny), never the corpus."""
    from .text import quality_exprs

    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(docs, threshold=NEARDUP_THRESHOLD)
    comp = connected_components(pairs)
    _, _, _, quality = quality_exprs()
    q = docs.select("doc_id", qround(quality, 6).alias("quality"))
    w = Window.partitionBy("comp").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        comp.join(q, comp.id == q.doc_id)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count("*").over(Window.partitionBy("comp")))
        .where(F.col("rn") == 1)
        .select(
            F.col("comp").cast("long").alias("group_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("doc_id").cast("long").alias("keep_doc_id"),
            F.col("quality").alias("keep_quality"),
        )
    )


# --- incremental dedup against a stored corpus (r13) --------------------------
#: the shard/corpus split for the registered incremental query: every
#: 10th doc "arrives" as the new shard, the rest are the stored corpus
INCR_SHARD_PRED = "doc_id % 10 = 0"
INCR_CORPUS_PRED = "doc_id % 10 <> 0"


@register_demoted(
    "dedup_incremental",
    oracle=incremental_neardup_sql(INCR_CORPUS_PRED, INCR_SHARD_PRED),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dedup against a stored signature corpus (the
    r13 frontier operator — operators/incremental.py): the corpus
    slice's MinHash state (signatures + band rows, ~1% the size of
    its text) is WRITTEN to a real parquet store under an idempotent
    ``shard_id=`` partition (the exactly-once sink pattern), READ
    BACK, and the arriving shard is matched against the read-back
    relations — so the driver's value hash certifies the full storage
    round-trip, not an in-memory stand-in (the
    events_stream_attribution precedent).  Output: one decision row
    per shard doc — (new_id, is_dup, dup_of, match_frac), dup_of =
    highest-agreement stored doc (>= 32/64 MinHash components, the
    J>=0.5 operating point; ties to smallest id), every verify in
    exact rational arithmetic so the oracle replays store build +
    match as one WITH chain.

    Why it matters at 100 TB: every batch dedup family rescans the
    corpus per run; this path touches ONLY the new shard's text plus
    signature-sized store relations, so per-shard cost is O(shard +
    candidates) however large the corpus grows — measured in
    stress/incremental_dedup_stress.py (corpus 50k -> 400k docs, fixed
    2k shard: full batch re-dedup 16.8 -> 35.9 s and climbing with the
    corpus, incremental match 4.1 -> 5.1 s near-FLAT with 100/100
    planted cross-split dups found at every size).  The candidate join
    BROADCASTS the shard's band rows (plan-verified BuildLeft
    BroadcastHashJoin, tests/test_incremental.py), so the store never
    shuffles for matching — its cost is one columnar scan of
    signature-sized data (~1% of the text it stands for) plus the
    map-side-combinable hot-bucket count; that scan is the residual
    slope in the stress curve.
    The sf0.01 corpus plants real near-dup families across the split,
    so is_dup rows are non-vacuous (value-asserted in
    tests/test_incremental.py alongside the append-replay idempotence
    contract)."""
    from ..functions.scratch import scratch_dir
    from ..operators.incremental import (
        append_shard_to_store,
        incremental_neardup_matches,
        read_store,
        read_store_bucket_counts,
    )

    d = table(spark, sf_dir, "documents")
    corpus = d.where(F.expr(INCR_CORPUS_PRED))
    shard = d.where(F.expr(INCR_SHARD_PRED))
    store = scratch_dir("sig_store_")
    append_shard_to_store(corpus, store, shard_id=0)
    sigs, bands = read_store(spark, store)
    bcounts = read_store_bucket_counts(spark, store)
    return incremental_neardup_matches(
        shard, sigs, bands, bucket_counts=bcounts
    )

"""Composed corpus-cleaning pipeline: oracle parity at the smoke SF
plus stage-behavior tests on injected duplicates (every stage must be
shown dropping real rows — round-1 vacuity lesson)."""

from __future__ import annotations

from pyspark.sql import functions as F

from recsys_spark_spark.plans.pipeline import clean_corpus, corpus_clean
from recsys_spark_spark.plans.registry import all_oracle_sql
from recsys_spark_spark.sources.readers import table

from conftest import assert_df_matches_oracle


def test_corpus_clean_oracle_parity(spark, sf_dir, duck):
    assert_df_matches_oracle(
        corpus_clean(spark, sf_dir), duck, all_oracle_sql()["corpus_clean"]
    )


def test_corpus_clean_stages_drop_rows(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = corpus_clean(spark, sf_dir)
    n_in, n_out = docs.count(), out.count()
    assert 0 < n_out < n_in, "pipeline passed everything or nothing"
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "zh" not in langs
    assert out.where(F.col("quality") < 0.46).count() == 0


def test_corpus_clean_drops_injected_exact_dupes(spark, sf_dir):
    """The exact-dedup stage on >0 actual duplicates: re-inject 25
    surviving docs under new ids; every clone must be dropped and
    every original kept."""
    docs = table(spark, sf_dir, "documents")
    base_kept = clean_corpus(docs)
    sample_ids = [r["doc_id"] for r in base_kept.orderBy("doc_id").limit(25).collect()]
    clones = (
        docs.where(F.col("doc_id").isin(sample_ids))
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    out = clean_corpus(docs.unionByName(clones))
    got_ids = {r["doc_id"] for r in out.collect()}
    assert not {i + 1_000_000 for i in sample_ids} & got_ids, "a clone survived"
    assert set(sample_ids) <= got_ids, "an original was dropped"
    # the clone injection changes nothing else
    assert got_ids == {r["doc_id"] for r in base_kept.collect()}

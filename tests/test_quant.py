"""Int8 quantized embedding search: quantization domain properties and
recall against the exact float baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from recsys_spark_spark.operators.quant import (
    Q_MAX,
    knn_bruteforce_int8,
    quantize_embeddings,
)
from recsys_spark_spark.plans.llm import (
    KNN_K,
    KNN_QUERIES,
    embedding_knn_bruteforce,
)
from recsys_spark_spark.sources.readers import table


def test_quantized_values_in_range(spark, sf_dir):
    qz = quantize_embeddings(table(spark, sf_dir, "embeddings"))
    bad = qz.where(
        F.exists("qvec", lambda v: (v > Q_MAX) | (v < -Q_MAX))
    ).count()
    assert bad == 0
    # every non-degenerate vector hits the full scale somewhere
    unsat = qz.where(
        ~F.exists("qvec", lambda v: F.abs(v) == Q_MAX)
    ).count()
    assert unsat == 0


def test_int8_knn_recall_vs_float_baseline(spark, sf_dir):
    """Per-vector absmax int8 keeps cosine ranking nearly intact:
    top-k recall vs the exact float baseline must stay high."""
    e = table(spark, sf_dir, "embeddings")
    exact = {
        (r["query_id"], r["match_id"])
        for r in embedding_knn_bruteforce(spark, sf_dir).collect()
    }
    quant = {
        (r["query_id"], r["match_id"])
        for r in knn_bruteforce_int8(e, KNN_QUERIES, KNN_K).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, f"int8 recall {recall:.3f} too low"

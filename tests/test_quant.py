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


def _int8_recall(spark, sf_dir: str) -> float:
    e = table(spark, sf_dir, "embeddings")
    exact = {
        (r["query_id"], r["match_id"])
        for r in embedding_knn_bruteforce(spark, sf_dir).collect()
    }
    quant = {
        (r["query_id"], r["match_id"])
        for r in knn_bruteforce_int8(e, KNN_QUERIES, KNN_K).collect()
    }
    return len(exact & quant) / len(exact)


def test_int8_knn_recall_vs_float_baseline(spark, sf_dir):
    """Per-vector absmax int8 keeps cosine ranking nearly intact:
    top-k recall vs the exact float baseline must stay high."""
    recall = _int8_recall(spark, sf_dir)
    assert recall >= 0.9, f"int8 recall {recall:.3f} too low"


def test_int8_knn_recall_sf01(spark):
    """Recall parity at the bench scale (sf0.1): the quantization-noise
    argument must hold where the base set is 10× denser, not just on
    the small oracle fixtures (round-3 verdict #6).  Threshold 0.95 =
    the figure PERF.md quotes."""
    import os

    sf01 = "/root/testdata/sf0.1"
    if not os.path.isdir(sf01):
        import pytest

        pytest.skip("sf0.1 testdata not present")
    recall = _int8_recall(spark, sf01)
    assert recall >= 0.95, f"int8 recall {recall:.3f} at sf0.1 too low"

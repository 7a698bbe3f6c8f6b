"""ANN similarity-search queries (SURVEY L3 scale path).

``embedding_knn_bruteforce`` (plans/llm.py) is the exact baseline —
a linear scan per query batch that cannot survive 100 TB or large
query sets.  The queries here run the same top-k through the
sign-LSH operator (operators/knn.py): signatures → band buckets →
candidate join → exact rerank.  The LCG-derived hyperplanes make the
whole pipeline deterministic, so it gets a REAL value-hash oracle
(the DuckDB twin regenerates identical planes) — the approximation is
cross-checked bit-for-bit, not just smoke-tested.  Recall against the
exact baseline is asserted separately in tests/test_knn.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.knn import cosine_knn_lsh, knn_lsh_oracle_sql
from ..sources.readers import table
from .llm import KNN_K, KNN_QUERIES
from .registry import register

#: testdata embeddings are 64-dim (TESTDATA.md); the Spark side infers
#: the dim from the data, the oracle needs it statically.
EMB_DIM = 64


@register(
    "embedding_knn_lsh",
    bench=True,
    oracle=knn_lsh_oracle_sql(KNN_QUERIES, KNN_K, EMB_DIM),
)
def embedding_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path: sign-LSH candidate generation + exact cosine
    rerank for the same query set as embedding_knn_bruteforce.

    Fewer than k matches for a query (not enough LSH candidates) is
    legitimate output — the oracle replays the identical pipeline.
    """
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < KNN_QUERIES)
    return cosine_knn_lsh(e, q, KNN_K)

"""recsys_spark_spark — a PySpark-native analytics & recommender engine.

A ground-up rebuild of the capabilities of danitico/recsys-spark
(reference at /root/reference, Scala/Spark 3.2.1) on idiomatic PySpark:
long-format DataFrames instead of a driver-side dense rating matrix
(reference: recommender/BaseRecommender.scala:87-132), co-rated
self-joins + window top-k instead of single-threaded driver loops
(reference: UserBasedTopKRecommender.scala:76-90), Catalyst/AQE for
planning, and MLlib (FPGrowth, KMeans, MinHashLSH) for the ML stages.

Layout:
    session        SparkSession builder (AQE on, UTC, sane shuffle parts)
    sources        readers (parquet star schema, reference CSV shapes)
    functions      similarity kernels, text analysis, vector math
    operators      scale paths: LSH knn, MinHash/SimHash near-dedup,
                   multimodal binary plumbing (mapInPandas)
    recommenders   user/item CF, content, hybrid, sequential
    metrics        ranking + prediction metrics, cross-validation
    plans          the named query registry (queries + DuckDB oracles)
    streaming      Structured Streaming surface over the events table
"""

__version__ = "0.1.0"

"""feature_store_test_spark — a PySpark-native analytics / feature-store engine.

A from-scratch re-expression of the capabilities of the reference project
``HichamBenbriqa/feature-store-test`` (a pandas + SageMaker Feature Store
workflow) on idiomatic Spark: lazy DataFrame plans optimized by Catalyst,
Parquet-backed versioned feature tables, Spark SQL training queries,
Structured-Streaming inference, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Layout:
    session      SparkSession factory tuned for the driver environment
    data         explicit schemas + loaders for the driver test tables
    registry     query registry pairing each Spark query with a DuckDB oracle
    queries/     oracle-checked query definitions (SURVEY.md §2 coverage)
    operators/   reusable operators (as-of join, latest-per-key, dedup, ANN, text)
    store/       versioned feature tables (offline history + online latest view)
    streaming/   Structured Streaming inference pipeline
    engineering  reference-parity feature engineering
    ml           train / score (pyspark.ml)
"""

__version__ = "0.1.0"

"""enclaveid_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference project enclave-id/enclaveid-data-pipeline
(a Dagster + Polars + Postgres/pgvector orchestration pipeline) as one
idiomatic PySpark engine:

- everything relational (projections, windows, percentiles, theta
  self-joins, top-k graphs) is declarative DataFrame / Spark SQL so
  Catalyst owns the physical plan;
- the reference's pgvector math is native array-column expressions
  (``zip_with`` / ``aggregate`` higher-order functions, no UDFs);
- the reference's LLM / embedding / clustering stages are
  ``mapInPandas`` / ``applyInPandas`` operators with pluggable,
  deterministic mock backends;
- per-user dynamic partitions become a plain ``user_id`` column with
  Hive-style partitioned, idempotent writes.

Layout:

- :mod:`~enclaveid_data_pipeline_spark.session` — SparkSession builder.
- :mod:`~enclaveid_data_pipeline_spark.sources` — readers, writers,
  partition discovery.
- :mod:`~enclaveid_data_pipeline_spark.functions` — scalar/array
  expression helpers (vector math, time handling, JSON & text
  extraction, text statistics).
- :mod:`~enclaveid_data_pipeline_spark.operators` — DataFrame ->
  DataFrame relational operators (recency split, sessionization,
  thresholds, similarity graphs, merge, dedup, knn, quality).
- :mod:`~enclaveid_data_pipeline_spark.ml` — model-backed batch
  operators (completion, embedding, clustering) behind Backend
  protocols.
- :mod:`~enclaveid_data_pipeline_spark.plans` — pipeline composition.
- :mod:`~enclaveid_data_pipeline_spark.streaming` — Structured
  Streaming variants (session windows).
"""

__version__ = "0.1.0"

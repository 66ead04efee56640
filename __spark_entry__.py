"""Driver contract for the spark-graft builder (PySpark target).

Thin view over :mod:`enclaveid_data_pipeline_spark.queries.REGISTRY`:
every implemented operator from SURVEY.md §2 registers a named Spark
query plus (when SQL-expressible) a DuckDB oracle. The driver runs
``entry(spark)`` as a smoke check and hash-compares each query
against its oracle at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from enclaveid_data_pipeline_spark.queries import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-user recency split (the reference's
    parsed_takeout ingest shape) on sf0.001."""
    return REGISTRY["recency_split_3mo"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None
    }

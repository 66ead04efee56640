"""Bucketed table layout — pay the join shuffle once, at write time.

The reference re-reads its per-user parquet on every materialization;
repeated fact⋈fact joins (orders ⋈ lineitem on orderkey) re-shuffle
both sides every query. Bucketing both tables on the join key with
the same bucket count co-locates matching keys: the sort-merge join
then needs NO Exchange and NO per-query Sort (proven by
tests/test_old_branch_bucketing.py, which asserts zero `Exchange`
operators in the executed plan).

Bucketed layouts require the session catalog (``saveAsTable``, not
bare parquet paths) — bucket metadata lives in the table definition.
At 100 TB this is the default layout for any fact table with a
dominant join key; choose bucket counts as a multiple of cluster
parallelism and keep them EQUAL across co-joined tables (unequal
counts fall back to a shuffle on one side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog
    table. Sorting within buckets additionally removes the per-query
    Sort under sort-merge joins."""
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.mode(mode).saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    """Drop a catalog table AND clear any orphaned warehouse
    directory (a prior session killed mid-write leaves files that
    break the next ``saveAsTable``)."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)

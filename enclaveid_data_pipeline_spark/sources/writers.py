"""Sinks (SURVEY §2.1 S2, S5, S7, S8).

The reference achieves idempotent per-user rewrites with
delete-then-insert against Postgres (assets/recent_history.py:130-138,
361-365, 461-464) and writes one snappy parquet per (asset, user). In
Spark both collapse into dynamic partition overwrite on a
``partitionBy(user_id)`` parquet layout: replaying one user replaces
exactly that user's partition, concurrent users' data is untouched, and
partition pruning gives per-user reads for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("user_id",),
    mode: str = "overwrite",
) -> None:
    """S2/S8: partitioned, idempotent parquet sink.

    With ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by
    :func:`~enclaveid_data_pipeline_spark.session.get_spark`),
    ``mode="overwrite"`` replaces only the partitions present in ``df``
    — the exact semantics of the reference's per-user
    DELETE-then-COPY, without the row-at-a-time round trips.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def insert_into_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("user_id",),
) -> None:
    """S7: table-to-table append (reference INSERT INTO ... SELECT,
    assets/recent_history.py:366-373).

    The append MUST use the target's partitioning: unpartitioned files
    dropped into a partitioned layout are invisible to partition
    discovery (rows silently vanish on read — pinned by test).
    """
    df.write.mode("append").partitionBy(*partition_cols).parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """S2-family ORC sink (zstd by default — ORC's best
    size/speed trade in practice); partition layout semantics match
    the parquet sink."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    max_rows_per_file: int = 100_000,
    count_col: str | None = None,
) -> "DataFrame":
    """Tokenizer-shard sink: the endpoint of the trainprep pipeline
    (dedup → filter → pack_sequences → HERE). Writes sequences
    partitioned by ``shard_col`` with a bounded row count per file
    (``spark.sql.files.maxRecordsPerFile`` — trainers memory-map
    whole files, so file size must be capped independently of shard
    skew), then returns a MANIFEST DataFrame — one row per emitted
    file with its shard, row count, and summed ``count_col`` (e.g.
    tokens per file) — built by re-scanning the written layout with
    ``input_file_name()``. Trainers consume the manifest to plan
    epoch schedules and data-parallel assignment without opening
    shards; the re-scan is one pushdown-friendly pass over data that
    was just written (hot in page cache), and makes the manifest
    reflect what is actually on disk rather than what the writer
    intended.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", str(max_rows_per_file))
    try:
        df.write.mode("overwrite").partitionBy(shard_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", prev)
    written = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if count_col is not None:
        aggs.append(F.sum(count_col).cast("long").alias(f"total_{count_col}"))
    return (
        written.groupBy(
            F.col(shard_col), F.input_file_name().alias("file")
        ).agg(*aggs)
    )

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

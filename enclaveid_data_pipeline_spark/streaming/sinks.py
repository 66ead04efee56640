"""foreachBatch sinks: route a stream into the engine's idempotent
batch writers.

The built-in file sink can only append; the reference's semantics are
partition REWRITE per user (delete-then-COPY,
assets/recent_history.py:130-178). ``foreachBatch`` bridges the two:
each micro-batch runs the same dynamic-partition-overwrite writer the
batch engine uses, so a re-delivered micro-batch (restart without a
committed checkpoint) overwrites its partitions instead of
duplicating rows — upsert-by-partition exactly-once on top of
at-least-once delivery, provided partition keys (not offsets) define
the rewrite unit.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources.writers import write_partitioned


def partition_upsert_sink(
    stream_df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("user_id",),
    checkpoint_dir: str | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """Write a stream to a partitioned parquet table where every
    micro-batch REWRITES the partitions it touches (dynamic partition
    overwrite) — the streaming continuation of S8's idempotent
    per-user rewrite.

    ``transform`` (optional) runs per micro-batch on the batch
    DataFrame — the place for per-batch aggregation or dedup that
    must see the whole micro-batch. Restart semantics: a replayed
    batch rewrites the same partitions to the same content
    (idempotent), so duplicates cannot accumulate across failures.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        write_partitioned(batch_df, path, partition_cols=partition_cols)

    w = stream_df.writeStream.foreachBatch(_write).outputMode("update")
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()

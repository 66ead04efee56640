"""Streaming sink + checkpoint recovery (SURVEY §2.11 / S2-streaming).

The reference's late-data story is "re-materialize the whole user
partition"; the streaming engine's is checkpointed offsets + an
idempotent file sink. This test stops a query mid-stream and restarts
it from the same checkpoint: every input row must appear in the output
exactly once — no loss, no duplication.
"""

from __future__ import annotations

import pathlib

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.streaming.sessions import EVENT_SCHEMA


def _start(spark, stream_dir, out_dir, ckpt_dir):
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    events = raw.select(
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        "user_id",
        "value",
    )
    return (
        events.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt_dir))
        .outputMode("append")
        .start()
    )


def test_file_sink_exactly_once_across_restart(spark, sf_dir, tmp_path):
    src = pathlib.Path(sf_dir) / "events.parquet"
    stream_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    ckpt_dir = tmp_path / "ckpt"
    stream_dir.mkdir()

    tbl = pq.read_table(src)
    n_total = tbl.num_rows
    half = n_total // 2
    pq.write_table(tbl.slice(0, half), stream_dir / "drop-000.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # phase 1: consume the first drop, then stop
    q = _start(spark, stream_dir, out_dir, ckpt_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got1 = spark.read.parquet(str(out_dir)).count()
    assert got1 == half

    # second drop lands while the query is DOWN
    pq.write_table(tbl.slice(half), stream_dir / "drop-001.parquet")

    # phase 2: restart from the same checkpoint — must pick up only
    # the unprocessed file
    q = _start(spark, stream_dir, out_dir, ckpt_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(str(out_dir))
    assert out.count() == n_total  # no loss, no reprocessing
    # exactly-once per key, not just per count
    assert out.select("event_id").distinct().count() == n_total

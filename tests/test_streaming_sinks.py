"""foreachBatch partition-upsert sink: replayed data rewrites its
partitions instead of appending duplicates."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.streaming.sessions import (
    read_event_stream,
)
from enclaveid_data_pipeline_spark.streaming.sinks import (
    partition_upsert_sink,
)


def _drop(spark, tmp_path, stream_dir, name, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string"
    ).select(
        "event_id",
        (F.col("ts_us") * 1000).alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    staging = tmp_path / "staging" / name
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    part = next(staging.glob("part-*.parquet"))
    shutil.copy(part, stream_dir / f"events-{name}.parquet")


def test_replayed_batch_does_not_duplicate(spark, tmp_path):
    stream_dir = tmp_path / "sink_in"
    stream_dir.mkdir()
    out = str(tmp_path / "sink_out")
    base = 1_700_000_000_000_000

    stream = read_event_stream(spark, str(stream_dir))
    q = partition_upsert_sink(
        stream.select("user_id", "event_id", "ts"), out
    )
    try:
        _drop(spark, tmp_path, stream_dir, "000", [(1, base, 7, "click")])
        q.processAllAvailable()
        assert spark.read.parquet(out).count() == 1
    finally:
        q.stop()

    # Simulate an uncommitted-checkpoint replay: a NEW query (no
    # checkpoint) re-reads the same input and writes again.
    q2 = partition_upsert_sink(
        read_event_stream(spark, str(stream_dir)).select(
            "user_id", "event_id", "ts"
        ),
        out,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    result = spark.read.parquet(out)
    assert result.count() == 1  # partition rewritten, not appended
    assert result.first()["user_id"] == 7


def test_transform_runs_per_batch(spark, tmp_path):
    stream_dir = tmp_path / "sink_in2"
    stream_dir.mkdir()
    out = str(tmp_path / "sink_out2")
    base = 1_700_000_000_000_000

    stream = read_event_stream(spark, str(stream_dir))
    q = partition_upsert_sink(
        stream,
        out,
        transform=lambda b: b.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    try:
        _drop(
            spark, tmp_path, stream_dir, "000",
            [(1, base, 7, "click"), (2, base + 1, 7, "view")],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(out).collect()
    assert [(r.user_id, r.n) for r in rows] == [(7, 2)]

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

from enclaveid_data_pipeline_spark.streaming.sessions import read_event_stream


def _start(spark, stream_dir, out_dir, ckpt_dir):
    raw = read_event_stream(
        spark, str(stream_dir), glob="*.parquet", max_files_per_trigger=1
    )
    events = raw.select(
        "event_id",
        "ts",
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


def test_streaming_exact_dedup_across_batches(spark, sf_dir, tmp_path):
    """Duplicate event_ids re-delivered in a LATER micro-batch must be
    suppressed by carried dedup state."""
    import pyarrow.parquet as pq
    from enclaveid_data_pipeline_spark.streaming.sessions import (
        streaming_exact_dedup,
    )

    src = pathlib.Path(sf_dir) / "events.parquet"
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    tbl = pq.read_table(src)
    n = tbl.num_rows
    half = n // 2
    # strictly increasing mtimes: the file source orders new files by
    # modification time, and back-to-back writes can tie — the dedup
    # assertions below depend on d0 processing before d1
    import os
    import time

    mt = time.time() - 3600
    pq.write_table(tbl.slice(0, half), stream_dir / "d0.parquet")
    os.utime(stream_dir / "d0.parquet", (mt, mt))
    # second drop re-delivers the last 100 rows of drop 1 + the rest
    dup = tbl.slice(half - 100, 100 + (n - half))
    pq.write_table(dup, stream_dir / "d1.parquet")
    os.utime(stream_dir / "d1.parquet", (mt + 10, mt + 10))

    events = read_event_stream(
        spark, str(stream_dir), glob="*.parquet", max_files_per_trigger=1
    )
    deduped = streaming_exact_dedup(events, watermark="365 days")

    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT event_id FROM dedup_stream")
    assert out.count() == n  # 100 re-deliveries suppressed
    assert out.distinct().count() == n


def test_streaming_near_dedup_flags_cross_batch_near_dups(spark, tmp_path):
    """A doc arriving in a later micro-batch that collides with earlier
    LSH bands must come out novel=false (any-band rule) or be fully
    suppressed (all bands seen); fresh docs come out novel=true."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from enclaveid_data_pipeline_spark.streaming.sessions import (
        streaming_near_dedup,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    other = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen seventeen"
    )
    t0 = 1_700_000_000_000_000  # µs epoch
    mins = 60_000_000

    import os
    import time

    mt0 = time.time() - 3600
    seq = [0]

    def batch(path, rows):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    [r[2] for r in rows], pa.timestamp("us")
                ),
            }
        )
        pq.write_table(tbl, path)
        # pin file-source pickup order (mtime ties are nondeterministic)
        os.utime(path, (mt0 + 10 * seq[0], mt0 + 10 * seq[0]))
        seq[0] += 1

    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    batch(stream_dir / "d0.parquet", [(1, base, t0), (2, other, t0)])
    # d1: doc 3 is an exact replica of doc 1 (all bands collide),
    # doc 4 is fresh
    fresh = (
        "red orange yellow green blue indigo violet white black "
        "brown cyan magenta silver golden copper bronze pewter"
    )
    batch(
        stream_dir / "d1.parquet",
        [(3, base, t0 + 2 * mins), (4, fresh, t0 + 2 * mins)],
    )
    # d2: watermark flusher far in the future so earlier windows close
    batch(
        stream_dir / "d2.parquet",
        [(9, "flush " * 10, t0 + 120 * mins)],
    )

    schema = "doc_id long, text string, ts timestamp"
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    out = streaming_near_dedup(raw, watermark="30 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("near_dedup_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r.doc_id: r
        for r in spark.sql("SELECT * FROM near_dedup_stream").collect()
    }
    assert rows[1].novel and rows[1].n_novel_bands == 4
    assert rows[2].novel and rows[2].n_novel_bands == 4
    assert 3 not in rows  # exact replica: zero novel bands, no row
    assert rows[4].novel and rows[4].n_novel_bands == 4

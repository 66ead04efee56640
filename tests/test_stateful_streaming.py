from __future__ import annotations

import pathlib

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.sessionize import sessionize
from enclaveid_data_pipeline_spark.sources.readers import read_table
from enclaveid_data_pipeline_spark.streaming.sessions import EVENT_SCHEMA
from enclaveid_data_pipeline_spark.streaming.stateful import stateful_sessionize


def test_stateful_sessionize_matches_batch_closed_sessions(spark, sf_dir, tmp_path):
    """Two file drops → two micro-batches → sessions spanning the drop
    boundary must be stitched by the carried GroupState, and every
    CLOSED session must equal the batch sessionizer's output (the
    trailing open session per user stays in state by design)."""
    src = pathlib.Path(sf_dir) / "events.parquet"
    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()

    # Split by global event time: preserves per-user arrival order
    # across the two drops, so cross-batch stitching is well-defined.
    # The split point is chosen INSIDE a session that (a) has events
    # on both sides of it and (b) is later closed by a > gap event of
    # the same user — so one stitched-across-the-boundary session is
    # guaranteed to appear in the closed output.
    gap_us = 1800 * 1_000_000
    tbl = pq.read_table(src).sort_by("ts")
    pdf = tbl.to_pandas().reset_index(drop=True)
    ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
    users = pdf["user_id"].to_numpy()

    split_idx = span_a_us = span_b_us = span_user = None
    by_user: dict[int, list[int]] = {}
    for i, u in enumerate(users):
        by_user.setdefault(int(u), []).append(i)
    for u, idxs in by_user.items():
        for k in range(len(idxs) - 2):
            a, b = idxs[k], idxs[k + 1]
            if 0 < ts_us[b] - ts_us[a] <= gap_us:
                # extend the session forward; need a closing gap after
                end = b
                closes = False
                for j in idxs[k + 2 :]:
                    if ts_us[j] - ts_us[end] > gap_us:
                        closes = True
                        break
                    end = j
                if closes:
                    split_idx, span_user = b, u
                    span_a_us, span_b_us = int(ts_us[a]), int(ts_us[b])
                    break
        if split_idx is not None:
            break
    assert split_idx is not None, "corpus has no closeable multi-event session"

    pq.write_table(tbl.slice(0, split_idx), stream_dir / "events-000.parquet")
    pq.write_table(tbl.slice(split_idx), stream_dir / "events-001.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force one drop per batch
        .parquet(str(stream_dir))
    )
    stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    out = stateful_sessionize(stream, gap_seconds=1800.0)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stateful_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM stateful_sessions")

    # Batch ground truth: same gap rule, drop each user's final
    # (still-open in the stream) session.
    batch = sessionize(read_table(spark, sf_dir, "events"), gap_threshold=1800.0)
    per_session = batch.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.coalesce("value", F.lit(0.0))), 4).alias("total_value"),
    )
    last = per_session.groupBy("user_id").agg(
        F.max("session_start").alias("_last_start")
    )
    expected = (
        per_session.join(last, "user_id")
        .filter(F.col("session_start") < F.col("_last_start"))
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )

    assert got.count() == expected.count() > 0
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert diff == 0

    # The constructed session spans the two drops: its first half
    # arrived in batch 1, second half in batch 2, and it was closed in
    # batch 2 — so its presence proves the GroupState hand-off.
    spanning = got.filter(
        (F.col("user_id") == span_user)
        & (F.col("session_start") <= F.timestamp_micros(F.lit(span_a_us)))
        & (F.col("session_end") >= F.timestamp_micros(F.lit(span_b_us)))
    )
    assert spanning.count() > 0

from __future__ import annotations

import pathlib

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.sessionize import sessionize
from enclaveid_data_pipeline_spark.sources.readers import read_table
from enclaveid_data_pipeline_spark.streaming.sessions import read_event_stream
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
    if pdf["ts"].dtype.kind == "M":  # μs-timestamp layout
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    else:  # legacy int64-nanos layout
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

    # one drop per micro-batch; schema adapts to the corpus layout
    stream = read_event_stream(
        spark, str(stream_dir), max_files_per_trigger=1
    )

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
    got_full = spark.sql("SELECT * FROM stateful_sessions")
    # drops preserve per-user order → zero cross-batch late events
    assert got_full.filter(F.col("n_late") != 0).count() == 0
    got = got_full.drop("n_late")

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


def _drop_events(spark, tmp_path, stream_dir, name, rows):
    """rows: (event_id, ts_us, user_id). Writes one stream file."""
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long"
    ).select(
        "event_id",
        # μs NTZ, like the current corpus layout
        F.timestamp_micros("ts_us").cast("timestamp_ntz").alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    staging = tmp_path / "staging" / name
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    import shutil

    part = next(staging.glob("part-*.parquet"))
    shutil.copy(part, stream_dir / f"events-{name}.parquet")


def _read_stream(spark, stream_dir):
    return read_event_stream(
        spark, str(stream_dir), max_files_per_trigger=1
    )


BASE_US = 1_700_000_000_000_000
HOUR_US = 3_600_000_000


def test_late_cross_batch_events_are_counted(spark, tmp_path):
    """An event arriving in batch 2 with ts before the open session's
    end is absorbed (same output as in-order arrival) but surfaces in
    n_late — disorder is observable, not silent."""
    stream_dir = tmp_path / "late_in"
    stream_dir.mkdir()
    _drop_events(
        spark, tmp_path, stream_dir, "000",
        [(1, BASE_US, 7, ), (2, BASE_US + 60_000_000, 7)],
    )
    q = None
    try:
        out = stateful_sessionize(_read_stream(spark, stream_dir), 1800.0)
        q = (
            out.writeStream.outputMode("append")
            .format("memory").queryName("late_sessions").start()
        )
        q.processAllAvailable()
        # batch 2: one LATE event (ts before session end) + a closer
        # event > gap later that closes the session
        _drop_events(
            spark, tmp_path, stream_dir, "001",
            [(3, BASE_US + 30_000_000, 7), (4, BASE_US + 3 * HOUR_US, 7)],
        )
        q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()
    rows = spark.sql("SELECT * FROM late_sessions").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_events == 3 and r.n_late == 1
    assert r.session_end.timestamp() * 1_000_000 == BASE_US + 60_000_000


def test_late_policy_error_fails_query(spark, tmp_path):
    stream_dir = tmp_path / "late_err_in"
    stream_dir.mkdir()
    _drop_events(spark, tmp_path, stream_dir, "000", [(1, BASE_US, 7)])
    q = None
    try:
        out = stateful_sessionize(
            _read_stream(spark, stream_dir), 1800.0, late_policy="error"
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory").queryName("late_err").start()
        )
        q.processAllAvailable()
        _drop_events(
            spark, tmp_path, stream_dir, "001",
            [(2, BASE_US - 60_000_000, 7)],
        )
        import pytest as _pytest

        with _pytest.raises(Exception, match="late cross-batch event"):
            q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()


def test_watermark_flushes_trailing_open_session(spark, tmp_path):
    """With watermark_delay, a quiet user's open session flushes once
    the watermark passes end+gap — no session is stuck in state."""
    stream_dir = tmp_path / "flush_in"
    stream_dir.mkdir()
    _drop_events(
        spark, tmp_path, stream_dir, "000",
        [(1, BASE_US, 7), (2, BASE_US + 60_000_000, 7)],
    )
    q = None
    try:
        out = stateful_sessionize(
            _read_stream(spark, stream_dir), 1800.0,
            watermark_delay="10 minutes",
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory").queryName("flush_sessions").start()
        )
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM flush_sessions").count() == 0
        # a much-later event for ANOTHER user advances the watermark
        # past user 7's end+gap → 7's open session must flush
        _drop_events(
            spark, tmp_path, stream_dir, "001",
            [(3, BASE_US + 6 * HOUR_US, 9)],
        )
        q.processAllAvailable()
        q.processAllAvailable()  # allow the no-data timeout batch
        rows = spark.sql(
            "SELECT * FROM flush_sessions WHERE user_id = 7"
        ).collect()
        assert len(rows) == 1
        assert rows[0].n_events == 2 and rows[0].n_late == 0
    finally:
        if q is not None:
            q.stop()

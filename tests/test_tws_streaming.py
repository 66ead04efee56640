"""transformWithStateInPandas sessionizer (streaming/tws.py): A/B
parity with the applyInPandasWithState form, late accounting, and
timer-driven flush. The two operators must be output-identical — the
API generation is a deployment choice, not a semantics one."""

from __future__ import annotations

import pathlib

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

# transformWithStateInPandas's state protocol needs google.protobuf at
# task runtime; without it every tws query dies mid-task.  Skip the
# whole module when absent (the capability stays covered by
# test_stateful_streaming.py and the session_window tests).
pytest.importorskip("google.protobuf")

from enclaveid_data_pipeline_spark.streaming.stateful import stateful_sessionize
from enclaveid_data_pipeline_spark.streaming.sessions import read_event_stream
from enclaveid_data_pipeline_spark.streaming.tws import (
    ROCKSDB_PROVIDER,
    tws_sessionize,
)

from test_stateful_streaming import BASE_US, HOUR_US, _drop_events, _read_stream

PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_state(spark):
    prev = spark.conf.get(PROVIDER_KEY, None)
    spark.conf.set(PROVIDER_KEY, ROCKSDB_PROVIDER)
    yield
    if prev is None:
        spark.conf.unset(PROVIDER_KEY)
    else:
        spark.conf.set(PROVIDER_KEY, prev)


def test_tws_matches_groupstate_sessionizer(spark, sf_dir, tmp_path, rocksdb_state):
    """Both stateful APIs over the same two-drop event stream must
    emit identical closed sessions (cross-batch stitching included)."""
    src = pathlib.Path(sf_dir) / "events.parquet"
    stream_dir = tmp_path / "ab_in"
    stream_dir.mkdir()
    tbl = pq.read_table(src).sort_by("ts")
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), stream_dir / "events-000.parquet")
    pq.write_table(tbl.slice(half), stream_dir / "events-001.parquet")

    outs = {}
    for name, op in (("tws_ab", tws_sessionize), ("gs_ab", stateful_sessionize)):
        stream = read_event_stream(spark, str(stream_dir), max_files_per_trigger=1)
        q = (
            op(stream, gap_seconds=1800.0)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        outs[name] = spark.sql(f"SELECT * FROM {name}")

    a, b = outs["tws_ab"], outs["gs_ab"]
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_tws_late_cross_batch_events_are_counted(spark, tmp_path, rocksdb_state):
    stream_dir = tmp_path / "tws_late_in"
    stream_dir.mkdir()
    _drop_events(
        spark, tmp_path, stream_dir, "000",
        [(1, BASE_US, 7), (2, BASE_US + 60_000_000, 7)],
    )
    q = None
    try:
        out = tws_sessionize(_read_stream(spark, stream_dir), 1800.0)
        q = (
            out.writeStream.outputMode("append")
            .format("memory").queryName("tws_late").start()
        )
        q.processAllAvailable()
        _drop_events(
            spark, tmp_path, stream_dir, "001",
            [(3, BASE_US + 30_000_000, 7), (4, BASE_US + 3 * HOUR_US, 7)],
        )
        q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()
    rows = spark.sql("SELECT * FROM tws_late").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_events == 3 and r.n_late == 1
    assert r.session_end.timestamp() * 1_000_000 == BASE_US + 60_000_000


def test_tws_timer_flushes_trailing_open_session(spark, tmp_path, rocksdb_state):
    """The registered event-time timer must flush a quiet user's open
    session once the watermark passes end+gap."""
    stream_dir = tmp_path / "tws_flush_in"
    stream_dir.mkdir()
    _drop_events(
        spark, tmp_path, stream_dir, "000",
        [(1, BASE_US, 7), (2, BASE_US + 60_000_000, 7)],
    )
    q = None
    try:
        out = tws_sessionize(
            _read_stream(spark, stream_dir), 1800.0,
            watermark_delay="10 minutes",
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory").queryName("tws_flush").start()
        )
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM tws_flush").count() == 0
        _drop_events(
            spark, tmp_path, stream_dir, "001",
            [(3, BASE_US + 6 * HOUR_US, 9)],
        )
        q.processAllAvailable()
        q.processAllAvailable()  # allow the timer batch
        rows = spark.sql(
            "SELECT * FROM tws_flush WHERE user_id = 7"
        ).collect()
        assert len(rows) == 1
        assert rows[0].n_events == 2 and rows[0].n_late == 0
    finally:
        if q is not None:
            q.stop()

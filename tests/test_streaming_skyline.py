"""Streaming skyline sink: the persisted frontier after N
micro-batches equals the brute-force skyline of every row ever
inserted (the insert-only upsert theorem, streamed), dominated
frontier members are evicted by later batches, and a
restart-from-zero replay leaves the frontier unchanged."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.streaming.sessions import (
    read_event_stream,
)
from enclaveid_data_pipeline_spark.streaming.sinks import skyline_sink

BASE = 1_700_000_000_000_000


def _drop(spark, tmp_path, stream_dir, name, rows):
    """rows: (event_id, a, b) — objectives packed into user_id and
    value of the standard event-stream layout."""
    df = spark.createDataFrame(
        rows, "event_id long, a long, b long"
    ).select(
        "event_id",
        F.timestamp_micros(F.lit(BASE)).cast("timestamp_ntz").alias("ts"),
        F.col("a").alias("user_id"),
        F.lit("p").alias("event_type"),
        F.col("b").cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    staging = tmp_path / "staging" / name
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    part = next(staging.glob("part-*.parquet"))
    shutil.copy(part, stream_dir / f"events-{name}.parquet")


def _brute(points):
    return sorted(
        q
        for q in points
        if not any(
            all(pc >= qc for pc, qc in zip(p, q))
            and any(pc > qc for pc, qc in zip(p, q))
            for p in points
        )
    )


def _project(df):
    return df.select(
        "event_id",
        F.col("user_id").alias("a"),
        F.col("value").cast("long").alias("b"),
    )


def test_skyline_sink_tracks_frontier_and_survives_replay(spark, tmp_path):
    stream_dir = tmp_path / "sky_in"
    stream_dir.mkdir()
    out = str(tmp_path / "sky_out")

    batch1 = [(1, 5, 1), (2, 1, 5), (3, 3, 3), (4, 2, 2)]
    batch2 = [(5, 4, 4), (6, 0, 0)]  # (4,4) evicts (3,3); (0,0) dominated

    q = skyline_sink(
        read_event_stream(spark, str(stream_dir)),
        out,
        objectives=("a", "b"),
        transform=_project,
    )
    try:
        _drop(spark, tmp_path, stream_dir, "000", batch1)
        q.processAllAvailable()
        mid = sorted(
            (r.a, r.b) for r in spark.read.parquet(out).collect()
        )
        assert mid == _brute([(a, b) for _, a, b in batch1])
        _drop(spark, tmp_path, stream_dir, "001", batch2)
        q.processAllAvailable()
    finally:
        q.stop()

    pts = [(a, b) for _, a, b in batch1 + batch2]
    final = sorted((r.a, r.b) for r in spark.read.parquet(out).collect())
    assert final == _brute(pts)
    evicted = {r.event_id for r in spark.read.parquet(out).collect()}
    assert 3 not in evicted and 6 not in evicted

    # restart with NO checkpoint AND a never-folded file already in
    # the directory: the source renumbers batches from 0, so a
    # batch-id high-water guard would skip the replayed low-numbered
    # batches — including the one carrying the NEW rows (the
    # round-9-advice loss window).  The fold is idempotent and runs
    # unconditionally, so the replay is harmless and the new
    # dominating point lands: (6,6) dominates every earlier point,
    # leaving it the sole frontier member.
    batch3 = [(7, 6, 6)]
    _drop(spark, tmp_path, stream_dir, "002", batch3)
    q2 = skyline_sink(
        read_event_stream(spark, str(stream_dir)),
        out,
        objectives=("a", "b"),
        transform=_project,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    pts_all = [(a, b) for _, a, b in batch1 + batch2 + batch3]
    again = sorted((r.a, r.b) for r in spark.read.parquet(out).collect())
    assert again == _brute(pts_all)
    assert (6, 6) in again


def test_skyline_sink_replay_does_not_duplicate_frontier(
    spark, tmp_path
):
    """The crash-between-write-and-checkpoint shape: a full
    checkpoint-less replay redelivers rows IDENTICAL to the persisted
    frontier's. Dominance needs a strict >, so without the sink's
    full-row dedup both copies survive skyline_kd and the frontier
    doubles (review finding, round 10)."""
    stream_dir = tmp_path / "sky2_in"
    stream_dir.mkdir()
    out = str(tmp_path / "sky2_out")

    batch1 = [(1, 5, 1), (2, 1, 5), (3, 3, 3)]
    q = skyline_sink(
        read_event_stream(spark, str(stream_dir)),
        out,
        objectives=("a", "b"),
        transform=_project,
    )
    try:
        _drop(spark, tmp_path, stream_dir, "000", batch1)
        q.processAllAvailable()
    finally:
        q.stop()
    first = sorted((r.a, r.b) for r in spark.read.parquet(out).collect())
    assert first == _brute([(a, b) for _, a, b in batch1])

    # replay with NO new data and NO checkpoint: every redelivered
    # row is byte-identical to a frontier row — the frontier must
    # come back EXACTLY equal, not doubled
    q2 = skyline_sink(
        read_event_stream(spark, str(stream_dir)),
        out,
        objectives=("a", "b"),
        transform=_project,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    again = sorted((r.a, r.b) for r in spark.read.parquet(out).collect())
    assert again == first  # multiset equality: no duplicated rows


def test_skyline_layers_sink_matches_batch_peel(spark, tmp_path):
    """Layer-state lifecycle, streamed: after N insert batches the
    persisted top-2 layers equal the batch peel over every row ever
    inserted (the pareto_layers_upsert_kd theorem, streamed), and a
    checkpoint-less replay leaves the state exactly equal (full-row
    dedup discipline)."""
    from enclaveid_data_pipeline_spark.streaming.sinks import (
        skyline_layers_sink,
    )

    stream_dir = tmp_path / "lay_in"
    stream_dir.mkdir()
    out = str(tmp_path / "lay_out")

    batch1 = [(1, 5, 1), (2, 1, 5), (3, 3, 3), (4, 2, 2)]
    batch2 = [(5, 4, 4), (6, 0, 0), (7, 6, 6)]

    def start():
        return skyline_layers_sink(
            read_event_stream(spark, str(stream_dir)),
            out,
            objectives=("a", "b"),
            id_col="event_id",
            n_layers=2,
            transform=_project,
        )

    q = start()
    try:
        _drop(spark, tmp_path, stream_dir, "000", batch1)
        q.processAllAvailable()
        _drop(spark, tmp_path, stream_dir, "001", batch2)
        q.processAllAvailable()
    finally:
        q.stop()

    def _brute_layers(pts):
        remaining = dict(pts)
        got = {}
        for layer in (1, 2):
            vals = list(remaining.values())
            sky = [
                i
                for i, q_ in remaining.items()
                if not any(
                    all(pc >= qc for pc, qc in zip(p, q_))
                    and any(pc > qc for pc, qc in zip(p, q_))
                    for p in vals
                )
            ]
            for i in sky:
                got[i] = layer
                del remaining[i]
        return got

    pts = {i: (a, b) for i, a, b in batch1 + batch2}
    expect = _brute_layers(pts)
    state = {
        r.event_id: r.layer for r in spark.read.parquet(out).collect()
    }
    assert state == expect

    # checkpoint-less replay: state must come back EXACTLY equal
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    rows = spark.read.parquet(out).collect()
    assert {r.event_id: r.layer for r in rows} == expect
    assert len(rows) == len(expect)  # no duplicated rows either

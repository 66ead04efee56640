"""Stream-stream interval join: result parity with the batch form and
cross-batch matching (a click in batch 2 finds an error buffered from
batch 1 — the stateful property a per-batch join would miss)."""

from __future__ import annotations

import pathlib
import shutil

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.sources.readers import read_table
from enclaveid_data_pipeline_spark.streaming.joins import (
    clicks_with_recent_errors,
)
from enclaveid_data_pipeline_spark.streaming.sessions import (
    read_event_stream,
    run_stream_to_memory,
)


def _batch_truth(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("err_user_id"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    return clicks.join(
        errors,
        (F.col("user_id") == F.col("err_user_id"))
        & (F.col("error_ts") < F.col("click_ts"))
        & (
            F.col("error_ts")
            >= F.col("click_ts") - F.expr("INTERVAL 10 minutes")
        ),
    ).select("user_id", "click_id", "error_id")


def test_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    src = pathlib.Path(sf_dir) / "events.parquet"
    stream_dir = tmp_path / "ssj_in"
    stream_dir.mkdir()
    shutil.copy(src, stream_dir / "events-000.parquet")

    stream = read_event_stream(spark, str(stream_dir))
    joined = clicks_with_recent_errors(stream, window="10 minutes")
    out = run_stream_to_memory(
        spark, joined, "ssj_pairs", output_mode="append"
    ).select("user_id", "click_id", "error_id")

    batch = _batch_truth(spark, sf_dir)
    assert batch.count() > 0  # fixture sanity: pairs exist
    sym_diff = batch.exceptAll(out).count() + out.exceptAll(batch).count()
    assert sym_diff == 0


def test_cross_batch_state_matching(spark, tmp_path):
    """An error delivered in micro-batch 1 must match a click arriving
    in micro-batch 2: the join keeps watermark-bounded state across
    batches rather than joining per batch."""
    stream_dir = tmp_path / "ssj_state"
    stream_dir.mkdir()

    def write_drop(name, rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts_us long, user_id long, event_type string"
        ).select(
            "event_id",
            # file carries raw int64 (ns) like events.parquet
            F.timestamp_micros("ts_us").cast("timestamp_ntz").alias("ts"),
            "user_id",
            "event_type",
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "staging" / name)
        )
        part = next(
            (tmp_path / "staging" / name).glob("part-*.parquet")
        )
        shutil.copy(part, stream_dir / f"events-{name}.parquet")

    base = 1_700_000_000_000_000  # µs epoch
    joined = clicks_with_recent_errors(
        read_event_stream(spark, str(stream_dir)), window="10 minutes"
    ).select("user_id", "click_id", "error_id")

    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_state_out")
        .start()
    )
    try:
        # batch 1: only the error
        write_drop("000", [(1, base, 7, "error")])
        q.processAllAvailable()
        # batch 2: a click 2 minutes later, same user
        write_drop("001", [(2, base + 120_000_000, 7, "click")])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM ssj_state_out").collect()
    assert [(r.user_id, r.click_id, r.error_id) for r in rows] == [(7, 2, 1)]


def test_stream_static_enrichment(spark, tmp_path):
    """Dim attributes attach per micro-batch with no streaming state;
    keys missing from the dim survive with NULLs (late dimension)."""
    from enclaveid_data_pipeline_spark.streaming.joins import enrich_stream
    from enclaveid_data_pipeline_spark.streaming.sessions import (
        read_event_stream,
    )

    stream_dir = tmp_path / "enrich_in"
    stream_dir.mkdir()
    dim = spark.createDataFrame(
        [(7, "gold"), (8, "basic")], "user_id long, tier string"
    )
    out = enrich_stream(
        read_event_stream(spark, str(stream_dir)).select("user_id", "event_id"),
        dim,
        on="user_id",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .start()
    )
    try:
        rows = [(1, 1_700_000_000_000_000, 7, "click"),
                (2, 1_700_000_000_000_001, 9, "view")]
        df = spark.createDataFrame(
            rows, "event_id long, ts_us long, user_id long, event_type string"
        ).select(
            "event_id",
            F.timestamp_micros("ts_us").cast("timestamp_ntz").alias("ts"),
            "user_id",
            "event_type",
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        df.coalesce(1).write.parquet(str(tmp_path / "staging_e"))
        part = next((tmp_path / "staging_e").glob("part-*.parquet"))
        shutil.copy(part, stream_dir / "events-000.parquet")
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.event_id: r.tier for r in spark.sql("SELECT * FROM enriched").collect()
    }
    assert got == {1: "gold", 2: None}

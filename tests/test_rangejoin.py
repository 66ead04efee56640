from __future__ import annotations

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.rangejoin import interval_join


def _frames(spark):
    pts = spark.createDataFrame(
        [
            (1, 10, 100),  # inside A
            (1, 11, 500),  # exactly A.end (closed bound -> match)
            (1, 12, 501),  # just past A.end -> no match
            (1, 13, 9_000_000_000),  # far bucket, inside B (spans buckets)
            (2, 20, 100),  # other user: no intervals -> orphan
        ],
        "user_id long, event_id long, ts_us long",
    )
    ivals = spark.createDataFrame(
        [
            (1, "A", 50, 500),
            (1, "B", 8_000_000_000, 10_000_000_000),
        ],
        "user_id long, name string, start_us long, end_us long",
    )
    return pts, ivals


def test_interval_join_closed_bounds_and_buckets(spark):
    pts, ivals = _frames(spark)
    got = {
        (r.event_id, r.name)
        for r in interval_join(
            pts, ivals, bucket_width_us=1_000_000_000
        ).collect()
    }
    assert got == {(10, "A"), (11, "A"), (13, "B")}


def test_interval_join_left_keeps_orphans(spark):
    pts, ivals = _frames(spark)
    out = interval_join(pts, ivals, bucket_width_us=1_000_000_000, how="left")
    rows = {r.event_id: r.name for r in out.collect()}
    assert rows[20] is None and rows[12] is None
    assert len(rows) == 5


def test_interval_join_no_duplicate_matches(spark):
    """An interval replicated across N buckets must still match a
    point exactly once (the point's bucket is unique)."""
    pts = spark.createDataFrame(
        [(1, 10, 250)], "user_id long, event_id long, ts_us long"
    )
    ivals = spark.createDataFrame(
        [(1, "A", 50, 500)], "user_id long, name string, start_us long, end_us long"
    )
    # width 100: A replicates into buckets 0..5, the point sits in one
    out = interval_join(pts, ivals, bucket_width_us=100)
    assert out.count() == 1

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.recency import recency_split
from enclaveid_data_pipeline_spark.operators.sessionize import (
    chunk_ids,
    session_gaps,
    session_spans,
    sessionize,
)
from enclaveid_data_pipeline_spark.operators.thresholds import (
    group_percentile,
    with_group_threshold,
)


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # user 1: two sessions separated by a 2-hour gap
    for i in range(3):
        rows.append((1, base + dt.timedelta(minutes=5 * i)))
    for i in range(2):
        rows.append((1, base + dt.timedelta(hours=2, minutes=5 * i)))
    # user 2: single event (gap is NULL)
    rows.append((2, base))
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_session_gaps_first_row_null(spark):
    out = session_gaps(_events(spark)).orderBy("user_id", "ts").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r.gap_seconds)
    assert by_user[1][0] is None
    assert by_user[1][1] == 300.0
    assert by_user[2] == [None]


def test_sessionize_splits_on_gap(spark):
    sess = sessionize(_events(spark), gap_threshold=1800.0)
    spans = session_spans(sess).orderBy("user_id", "session_id").collect()
    u1 = [s for s in spans if s.user_id == 1]
    assert [s.session_id for s in u1] == [1, 2]
    assert [s.n_events for s in u1] == [3, 2]
    u2 = [s for s in spans if s.user_id == 2]
    assert len(u2) == 1 and u2[0].n_events == 1


def test_chunk_ids_fixed_size(spark):
    df = _events(spark).withColumn("date", F.to_date("ts"))
    out = chunk_ids(df, chunk_size=2, order_cols=("ts",), group_cols=("user_id", "date"))
    counts = (
        out.groupBy("user_id", "chunk_id").count().orderBy("user_id", "chunk_id").collect()
    )
    u1 = [(r.chunk_id, r["count"]) for r in counts if r.user_id == 1]
    assert u1 == [(0, 2), (1, 2), (2, 1)]


def test_recency_split_keeps_recent_only(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1)),
        (1, dt.datetime(2024, 5, 1)),
        (1, dt.datetime(2024, 6, 1)),
        (2, dt.datetime(2023, 1, 1)),  # old user: own max anchors the window
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = recency_split(df, ts_col="ts", user_col="user_id", offset="-3mo")
    got = sorted((r.user_id, r.ts) for r in out.collect())
    assert got == [
        (1, dt.datetime(2024, 5, 1)),
        (1, dt.datetime(2024, 6, 1)),
        (2, dt.datetime(2023, 1, 1)),
    ]


def test_group_percentile_and_join(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 30.0), (2, 100.0)], "user_id long, v double"
    )
    t = {r.user_id: r.threshold for r in group_percentile(df, "v", 0.5).collect()}
    assert t == {1: 20.0, 2: 100.0}
    joined = with_group_threshold(df, "v", 0.5)
    assert joined.filter("user_id = 1 and threshold = 20.0").count() == 3


def test_group_percentile_approx_close_to_exact(spark, sf_dir):
    """§7.3.5: the approx escape hatch must track the exact percentile
    closely on real gap data (relative error bound from Greenwald-
    Khanna accuracy at the default 10000)."""
    from enclaveid_data_pipeline_spark.operators.sessionize import session_gaps
    from enclaveid_data_pipeline_spark.operators.thresholds import group_percentile
    from enclaveid_data_pipeline_spark.sources.readers import read_table

    gaps = session_gaps(read_table(spark, sf_dir, "events")).filter(
        "gap_seconds IS NOT NULL"
    )
    approx = group_percentile(gaps, "gap_seconds", 0.9, out_col="thr", approx=True)
    # GK sketches bound RANK error, not value error (p90 of a heavy
    # tail can sit in a sparse region): assert the approx value's rank
    # lands near 0.9, with slack for per-user rank granularity (1/n).
    from pyspark.sql import functions as F

    ranked = (
        gaps.join(approx, "user_id")
        .groupBy("user_id")
        .agg(
            (
                F.sum((F.col("gap_seconds") <= F.col("thr")).cast("long"))
                / F.count(F.lit(1))
            ).alias("frac"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(ranked) > 0
    for r in ranked:
        slack = max(0.02, 2.0 / r.n)
        assert 0.9 - slack <= r.frac <= 0.9 + slack, (r.user_id, r.frac, r.n)

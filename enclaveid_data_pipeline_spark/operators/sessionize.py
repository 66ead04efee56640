"""Sessionization pack (SURVEY §2.5 W1/W4, §2.9 G1/G2, §2.11).

Reference shape: LAG(time_end) per user ordered by (date, time_start)
(assets/recent_history.py:256-266), gap seconds via epoch subtraction
(268-275), then a learned gap threshold splits/merges sessions. The
classic Spark form is lag + "new session" flag + running sum — one
sort-based window pass per user, no iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutils import epoch_seconds


def session_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """W1 + W4: previous-event timestamp and gap seconds per user.

    ``gap_seconds`` is NULL on each user's first event (the reference
    filters that row out downstream, P6).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    return df.withColumn("prev_ts", prev).withColumn(
        "gap_seconds", epoch_seconds(F.col(ts_col)) - epoch_seconds(prev)
    )


def sessionize(
    df: DataFrame,
    gap_threshold: Column | float,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization: ``session_id`` per (user, session).

    A new session starts when the gap to the previous event exceeds
    ``gap_threshold`` seconds. ``gap_threshold`` may be a per-user
    column (the learned ``time_threshold`` of the reference,
    assets/recent_history.py:248-292) or a literal.

    Single window sort per user; the running ``sum`` over the
    new-session flag is the standard distributable cumsum form of the
    reference's iterative merge loop. Batch-mode equivalent of
    ``F.session_window`` (streaming variant in streaming/sessions.py).
    """
    thr = gap_threshold if isinstance(gap_threshold, Column) else F.lit(gap_threshold)
    w = Window.partitionBy(user_col).orderBy(ts_col)
    with_gaps = session_gaps(df, ts_col=ts_col, user_col=user_col)
    is_new = (
        F.col("gap_seconds").isNull() | (F.col("gap_seconds") > thr)
    ).cast("long")
    return with_gaps.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_spans(
    sessions: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Collapse sessionized rows to one row per (user, session):
    span start/end + event count (A6 GREATEST/LEAST as min/max aggs)."""
    return sessions.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def chunk_ids(
    df: DataFrame,
    chunk_size: int = 15,
    order_cols: tuple[str, ...] = ("ts",),
    group_cols: tuple[str, ...] = ("user_id", "date"),
) -> DataFrame:
    """G2: fixed-size row chunking within (user, day).

    Reference ``df.iter_slices(n_rows=15)`` feeds 15-row chunks to the
    LLM (utils/recent_history_utils.py:103). Distributed form:
    ``chunk_id = floor((row_number - 1) / n)`` over the per-group
    order — deterministic, shuffle-once, no driver iteration. Pass a
    tie-breaking id column in ``order_cols`` so chunk membership is
    total-order deterministic.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(
        "chunk_id",
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(chunk_size)),
    )

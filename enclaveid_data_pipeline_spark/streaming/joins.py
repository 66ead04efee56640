"""Watermarked stream-stream joins (SURVEY §2.11 extension).

The reference correlates event streams only in batch (theta self-join
in Postgres, assets/recent_history.py:384-411). The streaming engine
needs the online form: join two unbounded streams within a bounded
event-time distance, with watermarks turning the unbounded join state
into a sliding buffer.

State-size contract (the 100 TB/day property): each side buffers only
rows newer than (its watermark − the join's time range). Without BOTH
the watermarks and the time-range predicate, Spark would rightly
refuse to plan an inner stream-stream join in append mode — state
would be unbounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two event-time streams where ``right_ts`` falls within
    [left_ts - lower, left_ts + upper] (both interval strings), plus
    an equality key ``on`` — the streaming twin of
    operators.rangejoin.interval_join.

    Both inputs must be streaming DataFrames with event-time columns;
    watermarks are applied here so the state bound is part of the
    operator contract, not caller discipline. The equality key keeps
    the join hash-partitioned (state for one key lives on one
    executor); the time-range predicate is the residual condition
    that lets Spark evict buffered rows.

    Outer variants (``how='leftOuter'``/``'rightOuter'``) emit the
    unmatched row only once the watermark passes its join window —
    correct-but-delayed, the documented trade-off.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        on
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)


def clicks_with_recent_errors(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user click↔error correlation on one event stream split two
    ways: every (click, error) pair where the SAME user's error
    happened within ``window`` BEFORE the click — the streaming form
    of the as-of/interval analysis the batch engine runs in
    operators.asof / operators.rangejoin.

    Self-join of a stream with itself: Spark treats the two arms as
    independent streams; per-user keying bounds each key's state to
    its own recent rows.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("err_user_id"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    joined = interval_join_streams(
        clicks,
        errors,
        on=F.col("user_id") == F.col("err_user_id"),
        left_ts="click_ts",
        right_ts="error_ts",
        lower=window,
        upper="0 seconds",
        watermark=watermark,
    )
    return joined.filter(F.col("error_ts") < F.col("click_ts")).select(
        "user_id", "click_id", "click_ts", "error_id", "error_ts"
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — attach dimension attributes
    (user tier, document source metadata…) to a stream without any
    streaming state: the static side is re-executed per micro-batch,
    so there is nothing to watermark and nothing to expire. With
    ``broadcast_dim`` the dim ships to every task and the stream
    never shuffles — the right default for the classic small-dim
    case; turn it off for a dim too large to broadcast (the join
    then shuffles each micro-batch on the key, still stateless).

    Caveat pinned here rather than discovered in prod: per-batch
    re-execution re-reads the dim's DATA, but a parquet-path dim's
    FILE LISTING may be cached by the source — a dim that gains
    files mid-stream needs a catalog table (or stream restart) to be
    seen. Left join keeps stream rows whose key has no dim row yet
    (late dimension arrival), with NULL attributes to backfill."""
    cols = [on] if isinstance(on, str) else list(on)
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=cols, how=how)

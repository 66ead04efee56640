"""Ingest-path queries (SURVEY §2.2 P1-P3, §2.8 F1-F5, §2.4 A1).

These re-express the reference's ``parsed_takeout`` asset
(assets/takeout.py:57-76) over the ``events`` corpus table: derive
date/hour columns, recency-split against the per-user MAX timestamp
with calendar-month arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.recency import recency_split
from ..sources.readers import read_table
from .registry import register

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "recency_split_3mo",
    oracle=f"""
    SELECT user_id,
           event_id,
           strftime(ts, '{_TS_FMT_DUCK}') AS ts_s
    FROM (
        SELECT user_id, event_id, ts,
               max(ts) OVER (PARTITION BY user_id) AS max_ts
        FROM events
    )
    WHERE ts > max_ts - INTERVAL 3 MONTH
    """,
)
def recency_split_3mo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/A1/F3: rows within 3 calendar months of each user's last event.

    Reference: assets/takeout.py:70-72 (``filter(ts > ts.max()
    .dt.offset_by("-3mo"))``). Per-user MAX as an unordered window
    aggregate — one shuffle on user_id, filter evaluated map-side
    after the broadcast-back.
    """
    ev = read_table(spark, sf_dir, "events")
    out = recency_split(ev, ts_col="ts", user_col="user_id", offset="-3mo")
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts_s"),
    )


@register(
    "derive_time_columns",
    oracle=f"""
    SELECT event_id,
           user_id,
           strftime(ts, '%Y-%m-%d') AS date_s,
           strftime(ts, '%H:%M') AS hour_s,
           strftime(ts, '%Y-%m-%d') AS month_s
    FROM events
    WHERE event_type = 'click'
    """,
)
def derive_time_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/F1: projection + derived date/hour/month columns.

    Reference: assets/takeout.py:62-68 (rename + strftime columns).
    Pure map-side projection — no shuffle; filter + column pruning
    push into the parquet scan.
    """
    ev = read_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("date_s"),
        F.date_format("ts", "HH:mm").alias("hour_s"),
        F.date_format("ts", "yyyy-MM-dd").alias("month_s"),
    )


@register(
    "user_activity_summary",
    oracle=f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           strftime(min(ts), '{_TS_FMT_DUCK}') AS first_ts_s,
           strftime(max(ts), '{_TS_FMT_DUCK}') AS last_ts_s,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def user_activity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3: per-user activity envelope (count, first/last ts, sum).

    ``sum(value)`` rounds to 2dp: value has 2dp so the double sum is
    exact well past that precision at test scale; at 100 TB this
    column would be decimal.
    """
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), _TS_FMT_SPARK).alias("first_ts_s"),
        F.date_format(F.max("ts"), _TS_FMT_SPARK).alias("last_ts_s"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
            "sum_value"
        ),
    )

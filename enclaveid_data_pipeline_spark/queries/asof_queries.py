"""As-of join and approximate-sketch queries.

The as-of oracle uses DuckDB's native ASOF JOIN — an independent
implementation of the same semantics, so the union-window rewrite is
cross-checked against a reference engine rather than itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join_union
from ..operators.skew import salted_count_by_key
from ..sources.readers import read_table
from .registry import register


@register(
    "asof_last_error_before_click",
    oracle="""
    WITH clicks AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ), errors AS (
        SELECT user_id, ts, event_id AS err_event_id FROM events
        WHERE event_type = 'error'
    )
    SELECT c.user_id,
           c.event_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts_s,
           e.err_event_id AS asof_err_event_id
    FROM clicks c
    ASOF LEFT JOIN errors e
      ON c.user_id = e.user_id AND e.ts <= c.ts
    """,
)
def asof_last_error_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the user's most recent error at or
    before it (NULL when none yet). Engine side is the union+window
    rewrite — no join operator at all, one sort per user — checked
    against DuckDB's native ASOF JOIN."""
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_event_id")
    )
    joined = asof_join_union(
        clicks, errors, on="ts", by="user_id", value_cols=("err_event_id",)
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts_s"),
        "asof_err_event_id",
    )


@register("approx_distinct_parts", oracle=None)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (rows-only: HLL/KLL estimates are
    implementation-defined, so no cross-engine value oracle — the
    unit test pins the estimates against exact counts instead).
    At 100 TB these replace exact distinct/percentile where the
    oracle-exact forms would need a full shuffle of the key space."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "salted_event_counts",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a 5-value (maximally skewed)
    key — result identical to the direct groupBy, plan spreads each
    hot key over 16 reducers first."""
    ev = read_table(spark, sf_dir, "events")
    return salted_count_by_key(ev, ["event_type"], buckets=16)

"""As-of join and approximate-sketch queries.

The as-of oracle uses DuckDB's native ASOF JOIN — an independent
implementation of the same semantics, so the union-window rewrite is
cross-checked against a reference engine rather than itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeutils import epoch_micros
from ..operators.asof import asof_join_union
from ..operators.skew import salted_count_by_key
from ..operators.timeseries import interpolate_linear_fixedpoint, locf
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


@register(
    "asof_next_click_after_error",
    oracle="""
    WITH errors AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'
    ), clicks AS (
        SELECT user_id, ts, event_id AS click_event_id FROM events
        WHERE event_type = 'click'
    )
    SELECT e.user_id,
           e.event_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_ts_s,
           c.click_event_id AS asof_click_event_id
    FROM errors e
    ASOF LEFT JOIN clicks c
      ON e.user_id = c.user_id AND c.ts >= e.ts
    """,
)
def asof_next_click_after_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators.asof.asof_join_union
    direction="forward"): for every error, the user's earliest click
    at or after it — "did the user recover?" Engine side is the same
    union+window rewrite run with the opposite frame
    ([current, unboundedFollowing], FIRST IGNORE NULLS) and the
    opposite tie order; still zero join operators, one shuffle on
    user_id. Checked against DuckDB's native forward ASOF JOIN."""
    ev = read_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    joined = asof_join_union(
        errors,
        clicks,
        on="ts",
        by="user_id",
        value_cols=("click_event_id",),
        direction="forward",
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("err_ts_s"),
        "asof_click_event_id",
    )


_NEAREST_TOL_US = 600_000_000  # 10 minutes


@register(
    "asof_nearest_view_10m",
    oracle=f"""
    WITH clicks AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ), views AS (
        SELECT user_id, ts, event_id AS view_event_id FROM events
        WHERE event_type = 'view'
    ), both_dirs AS (
        SELECT c.user_id, c.event_id, c.ts,
               b.ts AS bts, b.view_event_id AS bid,
               f.ts AS fts, f.view_event_id AS fid
        FROM clicks c
        ASOF LEFT JOIN views b
          ON c.user_id = b.user_id AND b.ts <= c.ts
        ASOF LEFT JOIN views f
          ON c.user_id = f.user_id AND f.ts >= c.ts
    ), chosen AS (
        SELECT user_id, event_id, ts,
               CASE WHEN fts IS NULL THEN bid
                    WHEN bts IS NULL THEN fid
                    WHEN epoch_us(ts) - epoch_us(bts)
                         <= epoch_us(fts) - epoch_us(ts) THEN bid
                    ELSE fid END AS cand_id,
               CASE WHEN fts IS NULL THEN epoch_us(ts) - epoch_us(bts)
                    WHEN bts IS NULL THEN epoch_us(fts) - epoch_us(ts)
                    WHEN epoch_us(ts) - epoch_us(bts)
                         <= epoch_us(fts) - epoch_us(ts)
                         THEN epoch_us(ts) - epoch_us(bts)
                    ELSE epoch_us(fts) - epoch_us(ts) END AS cand_gap
        FROM both_dirs
    )
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS click_ts_s,
           CASE WHEN cand_gap <= {_NEAREST_TOL_US} THEN cand_id END
               AS asof_view_event_id
    FROM chosen
    """,
)
def asof_nearest_view_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join with a tolerance window
    (operators.asof.asof_join_union direction="nearest",
    tolerance=10min): for every click, the closest view event either
    direction, NULL when the nearest is over 10 minutes away —
    pd.merge_asof semantics (tolerance never falls back to the
    second-nearest; equal gaps resolve backward). Engine side runs
    BOTH window fills over one shuffle (the two sorts share the
    user_id partitioning) and picks per-row by gap; the oracle
    replays it as two native ASOF joins + the same gap CASE."""
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    joined = asof_join_union(
        clicks,
        views,
        on="ts",
        by="user_id",
        value_cols=("view_event_id",),
        direction="nearest",
        tolerance=_NEAREST_TOL_US,
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts_s"),
        "asof_view_event_id",
    )


@register(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS hll_within_15pct,
           true AS median_rank_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates with MEASURED accuracy (the
    approx_percentile_rank_error pattern, which closed the last
    rows-only gap in the registry): HLL/GK estimates are
    implementation-defined so their VALUES can't be cross-engine
    oracled, but their ERROR BOUNDS can — the query emits per-group
    booleans (HLL distinct within 3×rsd = 15% of exact; the approx
    median's true rank within n/accuracy + 1 of n/2 — the +1
    absorbs the sketch's rank-indexing convention, measured one row
    off the strict bound at sf0.01 — half-open tie interval) and the
    oracle predicts them TRUE, so any sketch
    regression is a hash mismatch. The exact sides ride the same
    aggregation (this is the accuracy-gate twin; production paths
    use the sketches alone). At 100 TB the sketches replace exact
    distinct/percentile where the exact forms would shuffle the full
    key space."""
    l = read_table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    # true rank interval of the returned approx median among the
    # group's values: [count(< v), count(<= v)] must intersect
    # [n/2 - n/acc, n/2 + n/acc] (acc = 10000, the Spark default)
    ranks = (
        l.join(
            F.broadcast(agg.select("l_returnflag", "approx_median")),
            on="l_returnflag",
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                (F.col("l_extendedprice") < F.col("approx_median")).cast("long")
            ).alias("rank_lo"),
            F.sum(
                (F.col("l_extendedprice") <= F.col("approx_median")).cast("long")
            ).alias("rank_hi"),
        )
    )
    acc = 10000.0
    return (
        agg.join(ranks, on="l_returnflag")
        .select(
            "l_returnflag",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("exact_parts").cast("long").alias("exact_parts"),
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 0.15 * F.col("exact_parts")
            ).alias("hll_within_15pct"),
            (
                (
                    F.col("rank_lo")
                    <= F.col("n_rows") / 2 + F.col("n_rows") / acc + 1
                )
                & (
                    F.col("rank_hi")
                    >= F.col("n_rows") / 2 - F.col("n_rows") / acc - 1
                )
            ).alias("median_rank_ok"),
        )
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


@register(
    "events_in_shrunk_windows",
    oracle="""
    WITH w AS (
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS date_s,
               epoch_us(min(ts)) + 3600000000 AS start_us,
               epoch_us(max(ts)) - 3600000000 AS end_us
        FROM events
        GROUP BY 1, 2
        HAVING epoch_us(min(ts)) + 3600000000 <= epoch_us(max(ts)) - 3600000000
    )
    SELECT w.user_id, w.date_s,
           CAST(count(e.event_id) AS BIGINT) AS n_interior
    FROM w JOIN events e
      ON e.user_id = w.user_id
     AND epoch_us(e.ts) >= w.start_us
     AND epoch_us(e.ts) <= w.end_us
    GROUP BY 1, 2
    """,
)
def events_in_shrunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (operators.rangejoin): count events inside each
    user-day's interior window (first/last hour trimmed).

    The bucketized equi-join replaces the non-equi BNLJ/cartesian the
    planner would otherwise pick for point-in-interval predicates —
    candidates are per (user, hour-bucket), the range check is a
    residual filter. Interior-trimmed windows make the residual do
    real work (boundary events must NOT match).
    """
    from ..operators.rangejoin import interval_join

    ev = read_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id", "event_id", epoch_micros("ts").alias("ts_us")
    )
    hour_us = 3_600_000_000
    w = (
        ev.groupBy(
            "user_id", F.date_format("ts", "yyyy-MM-dd").alias("date_s")
        )
        .agg(
            (epoch_micros(F.min("ts")) + hour_us).alias("start_us"),
            (epoch_micros(F.max("ts")) - hour_us).alias("end_us"),
        )
        .filter(F.col("start_us") <= F.col("end_us"))
    )
    joined = interval_join(
        pts,
        w,
        point_ts="ts_us",
        group_cols=("user_id",),
        bucket_width_us=hour_us,
    )
    return joined.groupBy("user_id", "date_s").agg(
        F.count("event_id").cast("long").alias("n_interior")
    )


@register(
    "daily_event_spine",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               CAST(min(ts) AS DATE) AS d0,
               CAST(max(ts) AS DATE) AS d1
        FROM events GROUP BY user_id
    ), spine AS (
        SELECT b.user_id, CAST(unnest(generate_series(b.d0, b.d1,
                          INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds b
    ), daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               count(*) AS n, sum(CAST(value AS DECIMAL(14,4))) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT s.user_id,
           strftime(s.day, '%Y-%m-%d') AS day_s,
           CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
           CAST(round(coalesce(d.v, 0), 4) AS DOUBLE) AS total_value
    FROM spine s
    LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
    """,
)
def daily_event_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification (gap-filling): one row per (user, day)
    between each user's first and last event, zero-filled where no
    events occurred — the shape every daily-metrics training table
    needs (missing days must be explicit zeros, not absent rows).

    ``sequence(min_date, max_date)`` + explode builds the spine from
    a per-user aggregate (no driver-side calendar); the left join
    back to the daily rollup is an equi-join on (user, day). Spine
    size is users × days — linear, and generated, not shuffled.
    """
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(14,4)")).alias("v"),
    )
    return (
        spine.join(daily, on=["user_id", "day"], how="left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day_s"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.round(F.coalesce(F.col("v"), F.lit(0).cast("decimal(14,4)")), 4)
            .cast("double")
            .alias("total_value"),
        )
    )


_GRID_SQL = """
    WITH bounds AS (
        SELECT user_id,
               CAST(min(ts) AS DATE) AS d0,
               CAST(max(ts) AS DATE) AS d1
        FROM events GROUP BY user_id
    ), spine AS (
        SELECT b.user_id, CAST(unnest(generate_series(b.d0, b.d1,
                          INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds b
    ), obs AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               round(max(value), 4) AS obs
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), grid AS (
        SELECT s.user_id, s.day, o.obs
        FROM spine s
        LEFT JOIN obs o ON o.user_id = s.user_id AND o.day = s.day
    )
"""


def _purchase_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (user, day) grid over each user's active span with the
    day's max purchase value where one happened, NULL elsewhere —
    the spine shape both gap-fills run on. MAX (order-independent)
    keeps the observed values bit-identical across engines."""
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("d0"),
        F.to_date(F.max("ts")).alias("d1"),
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    obs = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.round(F.max("value"), 4).alias("obs"))
    )
    return spine.join(obs, on=["user_id", "day"], how="left")


@register(
    "locf_daily_purchase_value",
    oracle=_GRID_SQL
    + """
    SELECT user_id,
           strftime(day, '%Y-%m-%d') AS day_s,
           CAST(obs AS DOUBLE) AS observed,
           CAST(last_value(obs IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS filled
    FROM grid
    """,
)
def locf_daily_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF gap-fill (operators.timeseries.locf — the hypertable
    ``time_bucket_gapfill`` + ``locf`` shape): each user's daily
    purchase value carried forward over no-purchase days; days
    before the first purchase stay NULL (LOCF never extrapolates
    backward). One window pass per user over the generated grid —
    linear, one shuffle on user_id."""
    grid = _purchase_grid(spark, sf_dir)
    filled = locf(grid, by="user_id", order="day", cols=["obs"])
    return filled.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day_s"),
        F.col("obs").alias("observed"),
        F.col("obs_locf").alias("filled"),
    )


@register(
    "linear_interp_daily_value",
    oracle=_GRID_SQL
    + """
    , g4 AS (
        SELECT user_id, day,
               CAST(round(obs * 10000) AS BIGINT) AS obs_x4
        FROM grid
    ), w AS (
        SELECT user_id, day, obs_x4,
               last_value(obs_x4 IGNORE NULLS) OVER wb AS prev_v,
               last_value(CASE WHEN obs_x4 IS NOT NULL THEN day END
                          IGNORE NULLS) OVER wb AS prev_d,
               first_value(obs_x4 IGNORE NULLS) OVER wf AS next_v,
               first_value(CASE WHEN obs_x4 IS NOT NULL THEN day END
                           IGNORE NULLS) OVER wf AS next_d
        FROM g4
        WINDOW wb AS (PARTITION BY user_id ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY day
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           strftime(day, '%Y-%m-%d') AS day_s,
           CAST(CASE
               WHEN obs_x4 IS NOT NULL THEN obs_x4
               WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
               ELSE (2 * (prev_v * (next_d - day) + next_v * (day - prev_d))
                     + (next_d - prev_d)) // (2 * (next_d - prev_d))
           END AS BIGINT) AS v_interp_x4
    FROM w
    """,
)
def linear_interp_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation gap-fill
    (operators.timeseries.interpolate_linear_fixedpoint —
    TimescaleDB ``interpolate`` semantics): interior no-purchase
    days get the straight line between the nearest observed
    neighbors; leading/trailing gaps stay NULL (no extrapolation).
    Two window fills (backward carries prev value+position, forward
    carries next) over ONE user_id partitioning — the second pass is
    a sort, not a shuffle; the weighted average is row-local. Output
    is fixed-point ×10⁴ (registry convention: exact integers over
    engine-dependent float rounding — the float form of this query
    differed from DuckDB by 1 ulp on a .5-boundary midpoint)."""
    grid = _purchase_grid(spark, sf_dir)
    g4 = grid.withColumn(
        "obs_x4", F.round(F.col("obs") * 10000).cast("long")
    )
    out = interpolate_linear_fixedpoint(
        g4,
        by="user_id",
        order="day",
        col="obs_x4",
        pos=F.unix_date(F.col("day")).cast("long"),
        out_col="v_interp_x4",
    )
    return out.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day_s"),
        F.col("v_interp_x4").cast("long").alias("v_interp_x4"),
    )

"""Extended relational coverage: rollup, pivot, set ops, range join,
running windows — operators the reference delegates to Polars or
Postgres internals (SURVEY §2.4 note, §2.7) and any engine user
expects to just work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .registry import register


@register(
    "rollup_lineitem_counts",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (subtotal + grand-total rows with
    NULLed keys) — one pass, partial-aggregated per grouping set."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_qty"),
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS status_f,
           CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS status_o,
           CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a pinned value list (unpinned pivot would scan twice
    to discover values — always pin at scale)."""
    o = read_table(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("status_p"),
    )


@register(
    "repeat_customers_y1_y2",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def repeat_customers_y1_y2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) of two filtered projections."""
    o = read_table(spark, sf_dir, "orders")
    y94 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y95 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y94.intersect(y95)


@register(
    "churned_customers_y1",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def churned_customers_y1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — ordered in year 1, never again after."""
    o = read_table(spark, sf_dir, "orders")
    y94 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    later = o.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    ).select("o_custkey")
    # subtract == SQL EXCEPT (distinct). exceptAll is MULTISET minus:
    # a key with 3 hits in y1 and 1 later would survive it.
    return y94.subtract(later)


@register(
    "order_fulfillment_lag",
    oracle="""
    SELECT o.o_orderkey,
           CAST(count(*) AS BIGINT) AS n_shipments,
           CAST(max(date_diff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT)
               AS max_ship_lag_days
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderkey
    """,
)
def order_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join (equi key + date band) — the engine's
    interval-join shape: the equi key keeps it a hash join, the band
    is a residual predicate, never a cross product."""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    joined = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate < F.timestamp_add("DAY", F.lit(90), o.o_orderdate)),
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        F.max(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        )
        .cast("long")
        .alias("max_ship_lag_days"),
    )


@register(
    "customer_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING
           ) AS DOUBLE), 2) AS running_spend,
           CAST(row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS BIGINT) AS order_seq
    FROM orders
    """,
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-frame window (ROWS UNBOUNDED PRECEDING) + sequence
    numbering in one sort pass per customer."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double"),
            2,
        ).alias("running_spend"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


@register(
    "cube_priority_status",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
               AS sum_totalprice
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status): all 2^2 grouping sets in one
    pass — Spark plans one Expand (4 replicas of each row's grouping
    columns only) + a single partial-aggregated shuffle; NULL marks
    the rolled-up dimensions exactly as in the DuckDB oracle."""
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("sum_totalprice"),
    )


@register(
    "grouping_sets_priority_status",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT)
               AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
               AS sum_totalprice
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderstatus), ())
    """,
)
def grouping_sets_priority_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Explicit GROUPING SETS (the asymmetric sets CUBE/ROLLUP can't
    express: detail + status-only + grand total, skipping
    priority-only) with ``grouping_id`` disambiguating a rolled-up
    dimension from a genuine NULL value — the standard cube-lattice
    pitfall. Spark plans ONE Expand (3 replicas carrying only the
    grouping columns) + a single partial-aggregated shuffle; at
    100 TB the replication factor is |sets|, not 2^dims, which is
    exactly why the asymmetric form matters."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("sum_totalprice"),
    )


@register(
    "value_outliers_2sigma",
    oracle="""
    WITH stats AS (
        SELECT user_id,
               avg(value) AS mu,
               stddev_samp(value) AS sigma,
               count(*) AS n
        FROM events
        WHERE value IS NOT NULL
        GROUP BY user_id
    )
    SELECT e.user_id, e.event_id,
           round((e.value - s.mu) / s.sigma, 4) AS z
    FROM events e JOIN stats s ON e.user_id = s.user_id
    WHERE e.value IS NOT NULL
      AND s.n >= 10 AND s.sigma > 0
      AND abs((e.value - s.mu) / s.sigma) > 2.0
    """,
)
def value_outliers_2sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outliers (|z| > 2σ) — the moment-aggregate
    family (avg + stddev_samp) as a broadcast-back grouped scalar,
    the standard anomaly screen a metrics pipeline runs per entity.

    Spark and DuckDB accumulate float moments in different orders;
    agreement to round(z, 4) holds because both use exact-count /
    compensated variance forms and |events per user| is far below
    where 1e-12 drift could cross a 4-decimal boundary.
    """
    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    stats = ev.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), on="user_id")
        .filter((F.col("n") >= 10) & (F.col("sigma") > 0) & (F.abs(z) > 2.0))
        .select("user_id", "event_id", F.round(z, 4).alias("z"))
    )


@register(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: per-user event-type counts as columns — the
    feature-matrix shape a model join wants. The value list is
    EXPLICIT (not inferred): inference costs an extra distinct scan
    and makes the output schema data-dependent, which breaks at scale
    where the schema must be known before the job runs. With pinned
    values Spark plans this as ONE groupBy of conditional aggregates
    — same plan as the CASE-sum SQL, no extra pass."""
    ev = read_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(t, F.lit(0)).cast("long").alias(t) for t in types],
    )


@register(
    "snapshot_reconciliation",
    oracle="""
    WITH a AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
    ), b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0
                    THEN round(o_totalprice * 1.1, 2)
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                WHEN a.o_totalprice <> b.o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(coalesce(a.o_orderkey, b.o_orderkey)) AS BIGINT)
               AS min_key
    FROM a FULL OUTER JOIN b USING (o_orderkey)
    GROUP BY 1
    """,
)
def snapshot_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff via FULL OUTER join — the reconciliation report
    every migration/backfill ends with: added / removed / changed /
    unchanged row counts between two keyed versions of a table
    (derived deterministically from orders here: mod-7 deletions,
    mod-5 additions gap, mod-3 price bumps). One co-partitioned
    full-outer equi-join on the key (both sides bucketed by key at
    scale → exchange-free), classification row-local."""
    orders = read_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("price_a")
    )
    b = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.round(F.col("o_totalprice") * 1.1, 2),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("price_b"),
    )
    j = a.join(b, on="o_orderkey", how="full_outer")
    status = (
        F.when(F.col("price_a").isNull(), F.lit("added"))
        .when(F.col("price_b").isNull(), F.lit("removed"))
        .when(F.col("price_a") != F.col("price_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").cast("long").alias("min_key"),
    )


@register(
    "column_stats_orders",
    oracle="""
    SELECT 'o_custkey' AS col,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(o_custkey) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv,
           CAST(min(o_custkey) AS VARCHAR) AS min_s,
           CAST(max(o_custkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(round(min(o_totalprice), 2) AS VARCHAR),
           CAST(round(max(o_totalprice), 2) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(min(o_orderstatus) AS VARCHAR),
           CAST(max(o_orderstatus) AS VARCHAR)
    FROM orders
    """,
)
def column_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (rows / non-null / NDV /
    min / max per column) — the stats table a cost-based optimizer
    and a data catalog both feed from. All columns' counters ride
    ONE aggregation pass (multiple count-distincts rewrite to one
    expand + two-phase agg, still a single scan); per-column rows
    come from exploding the struct of results, not re-scanning. At
    corpus scale swap exact NDV for approx_count_distinct — the
    exact form stays here because the oracle must replay it."""
    o = read_table(spark, sf_dir, "orders")
    row = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("nn_ck"),
        F.count_distinct(F.col("o_custkey")).alias("ndv_ck"),
        F.min("o_custkey").cast("string").alias("min_ck"),
        F.max("o_custkey").cast("string").alias("max_ck"),
        F.count("o_totalprice").alias("nn_tp"),
        F.count_distinct(F.col("o_totalprice")).alias("ndv_tp"),
        F.round(F.min("o_totalprice"), 2).cast("string").alias("min_tp"),
        F.round(F.max("o_totalprice"), 2).cast("string").alias("max_tp"),
        F.count("o_orderstatus").alias("nn_st"),
        F.count_distinct(F.col("o_orderstatus")).alias("ndv_st"),
        F.min("o_orderstatus").alias("min_st"),
        F.max("o_orderstatus").alias("max_st"),
    )
    cols = [
        ("o_custkey", "nn_ck", "ndv_ck", "min_ck", "max_ck"),
        ("o_totalprice", "nn_tp", "ndv_tp", "min_tp", "max_tp"),
        ("o_orderstatus", "nn_st", "ndv_st", "min_st", "max_st"),
    ]
    structs = [
        F.struct(
            F.lit(name).alias("col"),
            F.col("n").alias("n_rows"),
            F.col(nn).alias("n_nonnull"),
            F.col(ndv).alias("ndv"),
            F.col(mn).alias("min_s"),
            F.col(mx).alias("max_s"),
        )
        for name, nn, ndv, mn, mx in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select(
        "s.col", "s.n_rows", "s.n_nonnull", "s.ndv", "s.min_s", "s.max_s"
    )


@register(
    "incremental_join_refresh",
    oracle="""
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))), 2)
               AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY l.l_returnflag
    """,
)
def incremental_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-join view maintenance (operators.ivm): the orders⋈
    lineitem view is first built from the pre-delta bases (orderkey
    mod-4 split on orders, shipdate split on lineitem), then the
    deltas fold in via two delta-sized joins — and the summary must
    equal the full recompute the oracle runs, which is the whole IVM
    claim: the base⋈base join never runs again after day one. Only
    deltas shuffle; at scale both bases are bucketed on orderkey so
    even those joins co-locate."""
    from ..operators.ivm import incremental_join

    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    cut = F.lit("1996-06-01").cast("timestamp_ntz")
    a_old = o.filter(F.col("o_orderkey") % 4 != 0)
    da = o.filter(F.col("o_orderkey") % 4 == 0)
    b_old = l.filter(F.col("l_shipdate") < cut)
    db = l.filter(F.col("l_shipdate") >= cut)
    view = a_old.join(b_old, "o_orderkey")
    refreshed = incremental_join(view, a_old, da, b_old, db, "o_orderkey")
    return refreshed.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")), 2
        )
        .cast("double")
        .alias("revenue"),
    )


@register(
    "rfm_segments",
    oracle="""
    WITH mx AS (
        SELECT max(o_orderdate) AS max_d FROM orders
    ), base AS (
        SELECT o.o_custkey AS custkey,
               date_diff('day', max(o.o_orderdate), mx.max_d) AS recency_d,
               count(*) AS frequency,
               round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(14,2)))
                     AS DOUBLE), 2) AS monetary
        FROM orders o, mx
        GROUP BY o.o_custkey, mx.max_d
    ), scored AS (
        SELECT custkey,
               CAST(least(floor(percent_rank() OVER (
                   ORDER BY recency_d DESC, custkey) * 5), 4) + 1
                   AS INT) AS r,
               CAST(least(floor(percent_rank() OVER (
                   ORDER BY frequency, custkey) * 5), 4) + 1
                   AS INT) AS f,
               CAST(least(floor(percent_rank() OVER (
                   ORDER BY monetary, custkey) * 5), 4) + 1
                   AS INT) AS m
        FROM base
    )
    SELECT r, f, m,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(min(custkey) AS BIGINT) AS min_custkey
    FROM scored GROUP BY r, f, m
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary
    quintile codes (1–5 each, 5 best) and the population of every
    segment cell: the marketing-analytics workhorse, here with the
    recency axis ranked DESCENDING so recent buyers score high.
    One aggregate to per-customer RFM, three bucketed global ranks
    over the |customers|-row result (operators/rank.py: range
    buckets + broadcast prefix offsets — exact, tie-broken on
    custkey, parallel at any customer count), one segment rollup.
    DECIMAL money throughout."""
    orders = read_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("max_d"))
    base = (
        orders.join(F.broadcast(mx))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.date_diff(F.max("max_d"), F.max("o_orderdate")).alias(
                "recency_d"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast(
                    "double"
                ),
                2,
            ).alias("monetary"),
        )
    )

    from ..materialize import materialize as _materialize
    from ..operators.rank import global_percent_rank, monotone_bucket

    # each axis ranks through the bucketed two-pass form — range
    # buckets keep every quintile rank parallel at any |customers|
    # (clamping makes out-of-range values edge-bucket, never wrong).
    # base is materialized first: each two-pass rank embeds its input
    # three times (rows + bucket counts + total), so three chained
    # ranks would re-run the orders aggregate ~3^3 times (the
    # blended_quality_deciles round-12 finding; the |customers|-row
    # table is the cheap thing to pin, the orders scan is not).
    d = _materialize(base, "local")
    for out, order, bucket in (
        (
            "r",
            [F.col("recency_d").desc(), F.col("custkey")],
            monotone_bucket(-F.col("recency_d"), -2600.0, 0.0, 64),
        ),
        (
            "f",
            [F.col("frequency"), F.col("custkey")],
            monotone_bucket(F.col("frequency"), 0.0, 64.0, 64),
        ),
        (
            "m",
            [F.col("monetary"), F.col("custkey")],
            monotone_bucket(F.col("monetary"), 0.0, 2.0e6, 64),
        ),
    ):
        d = global_percent_rank(d, order, bucket, out=f"__pr_{out}")

    def _quintile(pr_col):
        return (
            F.least(F.floor(F.col(pr_col) * 5), F.lit(4)) + 1
        ).cast("int")

    scored = d.select(
        "custkey",
        _quintile("__pr_r").alias("r"),
        _quintile("__pr_f").alias("f"),
        _quintile("__pr_m").alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("custkey").cast("long").alias("min_custkey"),
    )


@register(
    "ltv_by_order_rank",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
               ) AS order_rank
        FROM orders
    ), cum AS (
        SELECT o_custkey, order_rank,
               sum(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
                   PARTITION BY o_custkey ORDER BY order_rank
               ) AS cum_spend
        FROM ranked
    )
    SELECT CAST(order_rank AS BIGINT) AS order_rank,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(avg(cum_spend) AS DOUBLE), 2) AS avg_cum_spend
    FROM cum WHERE order_rank <= 10
    GROUP BY order_rank
    """,
)
def ltv_by_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value curve by order number: average
    cumulative spend at each customer's 1st..10th order, with the
    surviving-customer count per rank — the retention-economics
    curve (how much is an Nth repeat purchase worth, how many make
    it that far). Rank and running sum share one per-customer
    window partitioning (one shuffle+sort); DECIMAL money until the
    final rounded projection."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = orders.select(
        "o_custkey",
        F.row_number().over(w).alias("order_rank"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .over(
            Window.partitionBy("o_custkey")
            .orderBy("o_orderdate", "o_orderkey")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cum_spend"),
    )
    return (
        ranked.filter(F.col("order_rank") <= 10)
        .groupBy(F.col("order_rank").cast("long").alias("order_rank"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("cum_spend").cast("double"), 2).alias(
                "avg_cum_spend"
            ),
        )
    )


@register(
    "unpivot_order_measures",
    oracle="""
    WITH m AS (
        SELECT o_orderpriority,
               'totalprice' AS measure,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total
        FROM orders GROUP BY o_orderpriority
        UNION ALL
        SELECT o_orderpriority, 'n_customers',
               CAST(count(DISTINCT o_custkey) AS DOUBLE)
        FROM orders GROUP BY o_orderpriority
        UNION ALL
        SELECT o_orderpriority, 'n_orders',
               CAST(count(*) AS DOUBLE)
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, measure, round(total, 2) AS total FROM m
    """,
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (the inverse of the pivot queries): per
    priority, three measures melted into (measure, total) rows via
    ``stack`` — one scan, row-local expansion; the oracle is the
    UNION ALL it desugars to. Money stays DECIMAL until the final
    projection."""
    orders = read_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("totalprice"),
        F.count_distinct(F.col("o_custkey"))
        .cast("double")
        .alias("n_customers"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
    )
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'totalprice', totalprice, "
        "'n_customers', n_customers, "
        "'n_orders', n_orders) AS (measure, total)",
    ).select(
        "o_orderpriority", "measure", F.round("total", 2).alias("total")
    )


_BENFORD_ORACLE = """
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                 AS VARCHAR), 1, 1) AS BIGINT) AS d
        FROM orders
        WHERE o_totalprice > 0
    ), obs AS (
        SELECT d, count(*) AS n FROM digits GROUP BY d
    ), tot AS (
        SELECT sum(n) AS nt FROM obs
    )
    SELECT obs.d AS first_digit,
           CAST(obs.n AS BIGINT) AS n,
           round(obs.n::DOUBLE / tot.nt, 6) AS observed_p,
           round(log10(1.0 + 1.0 / obs.d), 6) AS benford_p,
           round((obs.n::DOUBLE / tot.nt - log10(1.0 + 1.0 / obs.d))
                 / log10(1.0 + 1.0 / obs.d), 4) AS rel_dev
    FROM obs, tot
"""


@register("benford_first_digit", oracle=_BENFORD_ORACLE)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals — the
    classic cheap screen for fabricated or truncated numeric data
    (natural multi-scale amounts follow P(d) = log10(1 + 1/d);
    uniform synthetic prices deviate in a characteristic way, which
    this query makes visible instead of assuming). Digit extraction
    is string-head on the DECIMAL rendering (no float log tricks);
    only the final probabilities divide in double."""
    orders = read_table(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") > 0).select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("nt"))
    benford = F.log10(1.0 + 1.0 / F.col("d"))
    return obs.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("first_digit"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n").cast("double") / F.col("nt"), 6).alias(
            "observed_p"
        ),
        F.round(benford, 6).alias("benford_p"),
        F.round(
            (F.col("n").cast("double") / F.col("nt") - benford) / benford,
            4,
        ).alias("rel_dev"),
    )

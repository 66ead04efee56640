"""Materialized-view rollup-rewrite queries.

Each query ANSWERS FROM THE VIEW: the base fact table is aggregated
once to the MV grain (operators.mview.build_mview), and the reported
result is produced by :func:`~..operators.mview.rewrite_rollup` —
the subsumption check + measure re-derivation — never by re-scanning
base rows at query grain. The DuckDB oracle computes the same answer
directly from the base table, so a hash match proves the rewrite
algebra (SUM of partial sums, SUM of partial counts, re-MIN/MAX,
AVG = ΣSUM/ΣCOUNT) is exact. The MV-storage isolation proof (the
rewritten plan scans only snapshot files, zero base lineage) lives
in tests/test_mview.py::test_rewrite_plan_scans_only_mv — the
registered form builds the view in-frame so the driver harness stays
scratch-free.

Money/quantity math is DECIMAL at MV build time and stays DECIMAL
through both aggregation levels (registry convention: float sums are
order-dependent; decimal partials re-aggregate bit-exactly), cast to
DOUBLE only in the final projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mview import plan_mview, build_mview, rewrite_rollup
from ..sources.readers import read_table
from .registry import register

_TS_FMT = "yyyy-MM-dd HH:mm:ss"

_PRICING_SPEC = plan_mview(
    group_cols=["l_returnflag", "l_linestatus", "ship_month"],
    measures=[
        ("sum", "l_quantity"),
        ("count", "l_quantity"),
        ("count", "*"),
        ("max", "l_discount"),
        ("min", "l_shipdate"),
    ],
)

def _pricing_exprs():
    # built lazily: Column construction needs an active session
    return {
        "ship_month": F.month("l_shipdate"),
        "l_quantity": F.col("l_quantity").cast("decimal(12,2)"),
        "l_discount": F.col("l_discount").cast("decimal(8,4)"),
    }


def _pricing_mview(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = read_table(spark, sf_dir, "lineitem")
    return build_mview(base, _PRICING_SPEC, _pricing_exprs())


@register(
    "mv_rollup_pricing_by_flag",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 / count(l_quantity), 6) AS avg_qty,
           CAST(max(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS max_disc,
           strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship_s
    FROM lineitem
    WHERE month(l_shipdate) BETWEEN 3 AND 9
    GROUP BY l_returnflag, l_linestatus
    """,
)
def mv_rollup_pricing_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV query rewrite, subset-grain rollup: the view holds partial
    aggregates at (returnflag, linestatus, ship_month); the query
    wants (returnflag, linestatus) with a month-range filter. The
    rewrite filters MV rows on the grouping column and re-aggregates
    ~|grain| rows — at 100 TB that is a megabyte-scale scan standing
    in for a full fact-table pass. Derivations exercised: SUM (sum
    of sums), COUNT(*) (sum of counts), AVG (ΣSUM/ΣCOUNT of the
    column's own null-aware count), MAX, MIN-of-timestamp. A failed
    subsumption raises — a silent base-table fallback would let the
    oracle pass without testing the rewrite."""
    mv = _pricing_mview(spark, sf_dir)
    out = rewrite_rollup(
        mv,
        _PRICING_SPEC,
        ["l_returnflag", "l_linestatus"],
        aggs={
            "sum_qty": ("sum", "l_quantity"),
            "n_rows": ("count", "*"),
            "avg_qty": ("avg", "l_quantity"),
            "max_disc": ("max", "l_discount"),
            "min_ship": ("min", "l_shipdate"),
        },
        filters=[("ship_month", "between", (3, 9))],
    )
    if out is None:
        raise RuntimeError("MV rewrite unexpectedly rejected subsumption")
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("n_rows").alias("n_rows"),
        F.round(F.col("avg_qty").cast("double"), 6).alias("avg_qty"),
        F.col("max_disc").cast("double").alias("max_disc"),
        F.date_format("min_ship", _TS_FMT).alias("min_ship_s"),
    )


@register(
    "mv_rollup_global_filtered",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(max(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS max_disc
    FROM lineitem
    WHERE l_returnflag = 'R' AND month(l_shipdate) IN (1, 2, 12)
    """,
)
def mv_rollup_global_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV rewrite to the GLOBAL grain (empty grouping set) with
    equality + IN filters on view grouping columns — the other
    rollup path (``agg`` without ``groupBy``). Winter-months 'R'
    rows collapse to one output row; the filter runs on MV rows, so
    work is O(|grain|) regardless of fact-table size."""
    mv = _pricing_mview(spark, sf_dir)
    out = rewrite_rollup(
        mv,
        _PRICING_SPEC,
        [],
        aggs={
            "n_rows": ("count", "*"),
            "sum_qty": ("sum", "l_quantity"),
            "max_disc": ("max", "l_discount"),
        },
        filters=[
            ("l_returnflag", "=", "R"),
            ("ship_month", "in", (1, 2, 12)),
        ],
    )
    if out is None:
        raise RuntimeError("MV rewrite unexpectedly rejected subsumption")
    return out.select(
        F.col("n_rows").alias("n_rows"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("max_disc").cast("double").alias("max_disc"),
    )


@register(
    "mv_rollup_having",
    oracle="""
    SELECT l_returnflag,
           ship_month,
           CAST(sum_qty AS DOUBLE) AS sum_qty,
           n_rows
    FROM (
        SELECT l_returnflag,
               month(l_shipdate) AS ship_month,
               sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE month(l_shipdate) BETWEEN 3 AND 9
        GROUP BY l_returnflag, month(l_shipdate)
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 40000.5
           AND count(*) >= 100
    )
    """,
)
def mv_rollup_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV rewrite with HAVING (round-7 verdict item 7): post-
    aggregation filters on DERIVED measures are equally answerable
    from the view — the measure re-derives over ~|grain| MV rows,
    THEN the having filter runs, so the fact table is never scanned.
    The DuckDB oracle computes the same ``GROUP BY ... HAVING`` from
    the base table; thresholds compare EXACT types (decimal sum,
    bigint count — registry float-boundary convention: never HAVING
    on a float-derived measure whose engines' rounding could
    disagree at the cut). Zero-base-lineage for this plan is pinned
    in tests/test_mview.py."""
    mv = _pricing_mview(spark, sf_dir)
    out = rewrite_rollup(
        mv,
        _PRICING_SPEC,
        ["l_returnflag", "ship_month"],
        aggs={
            "sum_qty": ("sum", "l_quantity"),
            "n_rows": ("count", "*"),
        },
        filters=[("ship_month", "between", (3, 9))],
        having=[("sum_qty", ">", 40000.5), ("n_rows", ">=", 100)],
    )
    if out is None:
        raise RuntimeError("MV rewrite unexpectedly rejected subsumption")
    return out.select(
        "l_returnflag",
        # registry convention: calendar parts as BIGINT (DuckDB
        # month() is bigint; Spark month() is int)
        F.col("ship_month").cast("long").alias("ship_month"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("n_rows").alias("n_rows"),
    )


@register(
    "mv_cube_pricing",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
               AS grouping_id,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 / count(l_quantity), 6) AS avg_qty
    FROM lineitem
    WHERE month(l_shipdate) BETWEEN 3 AND 9
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def mv_cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE answered from the MV (round-6 verdict item 7): every
    grouping set of ``CUBE(returnflag, linestatus)`` is a subset of
    the view grain, so operators.mview.rewrite_cube composes four
    subset-grain rewrites (the round-6 subsumption check proves each
    one) and unions them with SQL-convention grouping ids. The
    DuckDB oracle computes the same CUBE from the BASE table — a
    hash match proves the composed algebra including the ΣSUM/ΣCOUNT
    AVG at every grouping level. Work is 4 × O(|grain|), never a
    fact-table pass."""
    from ..operators.mview import rewrite_cube

    mv = _pricing_mview(spark, sf_dir)
    out = rewrite_cube(
        mv,
        _PRICING_SPEC,
        ["l_returnflag", "l_linestatus"],
        aggs={
            "sum_qty": ("sum", "l_quantity"),
            "n_rows": ("count", "*"),
            "avg_qty": ("avg", "l_quantity"),
        },
        filters=[("ship_month", "between", (3, 9))],
    )
    if out is None:
        raise RuntimeError("MV cube rewrite unexpectedly rejected subsumption")
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("grouping_id"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("n_rows").alias("n_rows"),
        F.round(F.col("avg_qty").cast("double"), 6).alias("avg_qty"),
    )


@register(
    "mv_incremental_refresh",
    oracle="""
    WITH b AS (
        SELECT o_orderkey, o_custkey,
               CAST(round((o_totalprice
                    + CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE 0 END)
                    * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 3 <> 0
    )
    SELECT o_custkey,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(count(cents) AS BIGINT) AS n_vals,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM b GROUP BY o_custkey
    """,
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM under the rewrite layer
    (operators.mview.refresh_mview_incremental): the MV built at
    state A is retraction-maintained through the table_changes feed
    A→B and must equal a rebuild at state B — the oracle computes
    straight from B, so a hash match proves the fold crossed every
    change class (A drops keys %5, B drops %3 and bumps %4's price:
    inserts, deletes, updates, group-emptying and group-creating
    churn, the snapshot_change_feed fixture states). Exact integer
    cents (registry convention: retraction re-sums in a different
    order than a rebuild; floats would drift)."""
    from ..operators.cdc import table_changes
    from ..operators.mview import refresh_mview_incremental

    orders = read_table(spark, sf_dir, "orders")
    cents_a = F.round(F.col("o_totalprice") * 100).cast("long")
    cents_b = F.round(
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 4 == 0, F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        * 100
    ).cast("long")
    state_a = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", "o_custkey", cents_a.alias("cents")
    )
    state_b = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_custkey", cents_b.alias("cents")
    )
    spec = plan_mview(
        ["o_custkey"],
        [("sum", "cents"), ("count", "cents"), ("count", "*")],
    )
    mv_a = build_mview(state_a, spec)
    feed = table_changes(state_a, state_b, ["o_orderkey"])
    refreshed = refresh_mview_incremental(mv_a, spec, feed)
    return refreshed.select(
        "o_custkey",
        F.col("sum__cents").cast("long").alias("sum_cents"),
        F.col("count__cents").cast("long").alias("n_vals"),
        F.col("count__rows").cast("long").alias("n_rows"),
    )


def _cust_nation_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The star dimension: customer → nation name, keyed to the
    FACT's join column name so the enrich join is a same-name
    equi-join. Bounded (|customer| rows of 2 columns) — broadcast by
    the operators that consume it."""
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return customer.join(
        F.broadcast(nation),
        customer["c_nationkey"] == nation["n_nationkey"],
    ).select(F.col("c_custkey").alias("o_custkey"), "n_name")


_STAR_SPEC = plan_mview(
    group_cols=["n_name", "o_month"],
    measures=[("sum", "cents"), ("count", "cents"), ("count", "*")],
)


@register(
    "mv_star_rollup",
    oracle="""
    SELECT n_name,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM (
        SELECT n.n_name,
               month(o.o_orderdate) AS o_month,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    WHERE o_month BETWEEN 3 AND 9
    GROUP BY n_name
    """,
)
def mv_star_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAR-schema MV rewrite (round 8): the view is built over the
    fact⋈dim join (orders ⋈ customer ⋈ nation) at (nation, month)
    grain — build_mview takes any FRAME, so aggregate navigation
    over a star join needs no new algebra — and the month-filtered
    nation rollup is answered by rewrite_rollup from ~|grain| MV
    rows. At 100 TB this is THE dashboard shape: the fact⋈dim join
    and the fact scan are both paid once at view build; every query
    at-or-above the grain scans megabytes. The DuckDB oracle runs
    the full join + GROUP BY on base tables — a hash match proves
    the join-grain algebra end-to-end. Exact integer cents (registry
    money convention)."""
    orders = read_table(spark, sf_dir, "orders")
    fact = orders.select(
        "o_custkey",
        F.month("o_orderdate").alias("o_month"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    star = fact.join(_cust_nation_dim(spark, sf_dir), "o_custkey")
    mv = build_mview(star, _STAR_SPEC)
    out = rewrite_rollup(
        mv,
        _STAR_SPEC,
        ["n_name"],
        aggs={"sum_cents": ("sum", "cents"), "n_rows": ("count", "*")},
        filters=[("o_month", "between", (3, 9))],
    )
    if out is None:
        raise RuntimeError("star MV rewrite unexpectedly rejected")
    return out.select(
        "n_name",
        F.col("sum_cents").cast("long").alias("sum_cents"),
        F.col("n_rows").alias("n_rows"),
    )


@register(
    "mv_star_incremental",
    oracle="""
    WITH b AS (
        SELECT CASE WHEN o_orderkey % 7 = 0
                    THEN 1 + (o_custkey % 100)
                    ELSE o_custkey END AS o_custkey,
               CAST(round((o_totalprice
                    + CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE 0 END)
                    * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 3 <> 0
    )
    SELECT n.n_name,
           CAST(sum(b.cents) AS BIGINT) AS sum_cents,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM b
    JOIN customer c ON b.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def mv_star_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-aware IVM (round 8,
    operators.mview.refresh_star_mview_incremental): a star-grain MV
    (orders ⋈ customer ⋈ nation → per-nation totals) maintained from
    the FACT change feed alone — each change image joins to the
    broadcast dimension to resolve its nation, then retraction IVM
    folds it; the fact⋈dim join never re-runs over the fact table.
    The A→B churn exercises every class including CROSS-GROUP MOVES:
    B re-assigns every %7 order to customer ``1 + (o_custkey % 100)``
    (retract under the old nation, credit under the new), bumps %4
    prices (same-group value update), drops %3 (deletes incl.
    group-emptying) and restores %5 (inserts). The oracle computes
    straight from state B's full join — a hash match proves
    incremental == rebuild across the join. Exact integer cents."""
    from ..operators.cdc import table_changes
    from ..operators.mview import refresh_star_mview_incremental

    orders = read_table(spark, sf_dir, "orders")
    cents_a = F.round(F.col("o_totalprice") * 100).cast("long")
    cents_b = F.round(
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 4 == 0, F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        * 100
    ).cast("long")
    cust_b = F.when(
        F.col("o_orderkey") % 7 == 0,
        F.lit(1) + (F.col("o_custkey") % 100),
    ).otherwise(F.col("o_custkey"))
    state_a = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", "o_custkey", cents_a.alias("cents")
    )
    state_b = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", cust_b.alias("o_custkey"), cents_b.alias("cents")
    )
    dim = _cust_nation_dim(spark, sf_dir)
    spec = _STAR_SPEC
    # the MV for THIS view is at nation grain only (no month): a
    # dedicated spec keeps the test sharp
    spec = plan_mview(
        ["n_name"], [("sum", "cents"), ("count", "cents"), ("count", "*")]
    )
    mv_a = build_mview(state_a.join(dim, "o_custkey"), spec)
    feed = table_changes(state_a, state_b, ["o_orderkey"])
    refreshed = refresh_star_mview_incremental(
        mv_a, spec, feed, dim, "o_custkey"
    )
    return refreshed.select(
        "n_name",
        F.col("sum__cents").cast("long").alias("sum_cents"),
        F.col("count__rows").cast("long").alias("n_rows"),
    )

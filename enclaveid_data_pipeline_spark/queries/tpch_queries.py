"""Classic relational coverage on the TPC-H-ish corpus (FIXTURES §4).

The reference delegates joins/aggregates/windows to Polars and
Postgres internals; our engine must own them, so these queries pin
the behaviors on canonical shapes: wide aggregation (Q1), star join
with broadcast dims, top-k per group, semi/anti joins, set ops.

Money math is DECIMAL end-to-end and cast to DOUBLE only on output —
double sums are order-dependent and not reproducible across engines
(or across Spark partitionings, which matters more at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .registry import register


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))
                    * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(8,4)))), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter → 2-key groupBy → 8 aggregates.

    Fully partial-aggregable (map-side combine), shuffles only
    (flag, status) partials; the shipdate filter and 7-column
    projection push into the parquet scan.
    """
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,4)")
    tax = F.col("l_tax").cast("decimal(8,4)")
    one = F.lit(1).cast("decimal(5,4)")
    cnt = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.round(F.sum(price * (one - disc)), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(price * (one - disc) * (one + tax)), 2)
        .cast("double")
        .alias("sum_charge"),
        F.round(F.sum(qty).cast("double") / cnt, 6).alias("avg_qty"),
        F.round(F.sum(price).cast("double") / cnt, 6).alias("avg_price"),
        F.round(F.sum(disc).cast("double") / cnt, 6).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@register(
    "revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⋈ orders ⋈ customer ⋈ broadcast(nation).

    nation is a constant-size dim (25 rows) — broadcast it as a
    contract. customer GROWS with SF, so it stays a shuffled
    equi-join; AQE may still broadcast it at small SF, which is the
    right call at that scale and the right fallback at 100 TB.
    """
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,4)")
    one = F.lit(1).cast("decimal(5,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(price * (one - disc)), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "top3_orders_per_customer",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2) AS total_price,
           CAST(rn AS BIGINT) AS rn
    FROM ranked
    WHERE rn <= 3
    """,
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/O3 generalized: top-k per group via row_number window.

    Deterministic tie-break on o_orderkey. Spark physical plan: one
    shuffle on o_custkey + per-partition sort; AQE coalesces the tiny
    post-filter output.
    """
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
    )
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS). Spark: left_anti — no row materialization
    of the probe side, broadcastable when the order-key set is small."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "suppliers_in_customer_nations",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey
    FROM supplier
    WHERE EXISTS (
        SELECT 1 FROM customer
        WHERE c_nationkey = s_nationkey AND c_acctbal > 9000
    )
    """,
)
def suppliers_in_customer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS) with a pushed-down predicate on the build side."""
    s = read_table(spark, sf_dir, "supplier")
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return s.join(
        F.broadcast(c), s.s_nationkey == c.c_nationkey, "left_semi"
    ).select("s_suppkey", "s_name", "s_nationkey")


@register(
    "order_priority_counts",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (COUNT DISTINCT expands to a two-stage agg)."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")
    )
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "nations_union_regions",
    oracle="""
    SELECT n_name AS name, 'nation' AS kind FROM nation
    UNION ALL
    SELECT r_name AS name, 'region' AS kind FROM region
    """,
)
def nations_union_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: unionByName of conformed projections."""
    n = read_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"), F.lit("nation").alias("kind")
    )
    r = read_table(spark, sf_dir, "region").select(
        F.col("r_name").alias("name"), F.lit("region").alias("kind")
    )
    return n.unionByName(r)

"""Second TPC-H-shaped pack: the canonical plan shapes the first pack
does not cover (FIXTURES §4 / SURVEY §5.2 breadth goals).

Covered here: order-by-limit top-k after a 3-way join (Q3), nation-pair
conditional join (Q7), market-share conditional ratio over a 7-table
star (Q8), profit rollup over a 5-way star (Q9), returned-item top-k
(Q10), scalar-subquery HAVING (Q11), outer-join count distribution
(Q13), conditional-aggregate share (Q14), global-max equality select
(Q15), distinct-count grouped dims (Q16), correlated-average join
(Q17), disjunctive multi-clause predicate (Q19), nested semi-join
chain (Q20), exists/not-exists decorrelation (Q21), anti-join +
scalar-subquery threshold (Q22).

All money math follows the registry conventions: DECIMAL end-to-end,
DOUBLE only in the output projection, ``round(x, 2)`` on sums of
products. Timestamps are emitted as strings.

The reference delegates these shapes to Postgres (SURVEY §2.3/§2.4);
at 100 TB the interesting physical choices are noted per query:
which side broadcasts, where the partial aggregate lands, and which
predicates reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table
from .registry import register

def _revenue():
    # built lazily: Column construction needs an active SparkContext
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(8,4)")
    one = F.lit(1).cast("decimal(5,4)")
    return price * (one - disc)

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))"
)


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate_s,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 3-way join → agg → top-10.

    customer is filtered to one segment before the join (predicate
    reaches the scan, and the surviving ~1/5 broadcasts under AQE);
    the global top-10 is a TakeOrdered physical op — no full sort.
    The orderkey tiebreak makes LIMIT deterministic across engines.
    """
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q7_nation_pair_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_name <> nc.n_name
      AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, ship_year
    HAVING CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) > 0
    """,
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two nation lookups on opposite sides of the
    fact, inequality residual between them, year rollup.

    Both nation copies broadcast (25 rows); supplier broadcasts under
    AQE. The `<>` residual runs post-join — it references columns
    from both branches so it cannot push down, which is the point of
    the shape. One shuffle: the final 3-key aggregate.
    """
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    ns = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nc = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("volume"))
        .filter(F.col("volume") > 0)
    )


@register(
    "q9_profit_by_nation_year",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type LIKE 'PROMO%'
    GROUP BY nation, order_year
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: 5-way star rollup to (nation, year).

    The part filter (`p_type LIKE 'PROMO%'`) is the selective edge:
    applied before the join so the fact⋈part join is semi-join-sized.
    part/supplier/nation all broadcast; orders is the only co-shuffled
    side. The rollup is fully partial-aggregable.
    """
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type").like("PROMO%"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("profit"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey,
           c.c_name,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           round(c.c_acctbal, 2) AS acctbal,
           n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-revenue per customer, top 20.

    Both date bounds and the returnflag equality push into the
    parquet scans; the 4-key groupBy keys are functionally dependent
    on c_custkey but kept (TPC-H text) — at scale this is fine because
    the agg shuffles on the full key yet cardinality is |customers|.
    """
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q11_important_parts",
    oracle="""
    SELECT l_partkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           > (SELECT 1.5 * (CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                                     * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                            / count(DISTINCT l_partkey))
              FROM lineitem)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped sum HAVING > global-scalar threshold.

    The threshold is 1.5× the average per-part value — scale-FREE
    (a fixed fraction-of-total shrinks per part as |parts| grows and
    empties the result at larger SF; tested non-empty at sf0.01 AND
    sf0.1). It is a one-row aggregate broadcast into the filter
    (scalar subquery → BroadcastNestedLoopJoin of a single row).
    Sums stay DECIMAL (exact) and convert to DOUBLE once, so both
    engines compare identical operands. Two passes over lineitem,
    both partial-aggregated map-side.
    """
    l = read_table(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice").cast("decimal(12,2)") * F.col(
        "l_quantity"
    ).cast("decimal(12,2)")
    per_part = l.groupBy("l_partkey").agg(F.sum(value).alias("_value"))
    total = l.agg(
        (
            F.lit(1.5)
            * (F.sum(value).cast("double") / F.countDistinct("l_partkey"))
        ).alias("_threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_value").cast("double") > F.col("_threshold"))
        .select("l_partkey", F.col("_value").cast("double").alias("part_value"))
    )


@register(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT CAST(EXTRACT(month FROM l.l_shipdate) AS BIGINT) AS ship_month,
           round(100.0 * CAST(round(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN {_REV_SQL}
                              ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
                 / CAST(round(sum({_REV_SQL}), 2) AS DOUBLE), 4) AS promo_share
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY ship_month
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio (promo share).

    One join, one aggregate: the CASE folds the promo/non-promo split
    into a single pass instead of two joins. part broadcasts. The
    ratio divides two already-rounded DECIMAL sums in DOUBLE space so
    both engines see bit-identical operands.
    """
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type").like("PROMO%"), _revenue()).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.month("l_shipdate").cast("long").alias("ship_month"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.round(F.sum(promo), 2).cast("double")
                / F.round(F.sum(_revenue()), 2).cast("double"),
                4,
            ).alias("promo_share")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum({_REV_SQL}), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey,
           s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax via equality against a global max.

    The revenue aggregate computes once over the filtered fact; the
    global max is a ONE-ROW aggregate of that (small) frame,
    broadcast back as a filter — no empty-partition window, which
    would funnel every supplier row through a single task. DECIMAL
    equality is exact, so ties return every tied supplier,
    identically in both engines.
    """
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    s = read_table(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_revenue()), 2).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max"))
    top = revenue.join(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("_max")
    )
    return (
        s.join(top, s.s_suppkey == top.supplier_no)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_counts",
    oracle="""
    SELECT p.p_brand,
           p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
    GROUP BY p.p_brand, p.p_size
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) over grouped dim attributes.

    Spark expands distinct-agg into a two-phase plan (Expand +
    two aggregates) — partial distinct runs map-side so the shuffle
    carries (brand, size, suppkey) triples, not raw lineitems. The
    IN-list and <> predicates prune part before the join; part then
    broadcasts.
    """
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN (SELECT l_partkey,
                 0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                        / count(*)) AS qty_threshold
          FROM lineitem
          GROUP BY l_partkey) t
      ON l.l_partkey = t.l_partkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#5'
      AND l.l_quantity < t.qty_threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: row vs its group's average (correlated agg
    decorrelated into a self-join).

    The per-part average materializes as a |parts|-sized frame and
    joins back on partkey — the decorrelation every modern optimizer
    applies to Q17. The threshold is DECIMAL-sum / count in DOUBLE
    (exact, portable). The brand filter prunes part before its join.
    """
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    thresholds = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")) / 7.0, 2
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides.

    Catalyst derives the cross-side implied predicates: the brand
    IN-list pushes to the part scan and the quantity range [1, 30]
    pushes to the lineitem scan even though the full disjunction can
    only evaluate post-join. One broadcast join, one scalar agg.
    """
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(
            F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH threshold AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS avg_bal
        FROM customer
        WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + anti-join.

    "Idle" = above-average balance with no orders since 2001 (the
    corpus has no order-less customers, so a bare NOT EXISTS would be
    vacuous). The positive-balance average is one broadcast row; the
    anti-join against recent orders ships only o_custkey (column
    pruning + pushed date bound) and builds the hash table on the
    distinct custkeys. The threshold is a DECIMAL sum divided in
    DOUBLE — identical operands in both engines, so the boundary
    rows agree.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    threshold = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer-join count distribution (customers with
    zero qualifying orders must appear in the c_count=0 bucket).

    The priority filter lives in the JOIN CONDITION, not a WHERE —
    on an outer join those are different queries, which is what this
    shape pins. count(o_orderkey) counts non-null matches only. Two
    aggregations, both partial-combinable; the second one's input is
    |customers| rows.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH flat AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
               round(sum(CASE WHEN ns.n_name = 'NATION_3'
                              THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(12,2)) END), 2)
                   AS nation_volume,
               round(sum({_REV_SQL}), 2) AS total_volume
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        JOIN region r ON nc.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        WHERE r.r_name = 'EUROPE'
        GROUP BY order_year
    )
    SELECT order_year,
           round(CAST(nation_volume AS DOUBLE)
                 / CAST(total_volume AS DOUBLE), 6) AS mkt_share
    FROM flat
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — conditional aggregate
    over a 7-table star, ratio per order-year.

    One pass computes both the nation-filtered and the total volume
    (CASE inside sum — no second scan/join); region prunes the
    customer branch before the fact join. The two DECIMAL sums are
    rounded before the DOUBLE division, so both engines divide
    identical operands.
    """
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nc = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    ns = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nation_rev = F.when(
        F.col("supp_nation") == "NATION_3", _revenue()
    ).otherwise(F.lit(0).cast("decimal(12,2)"))
    flat = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.round(F.sum(nation_rev), 2).alias("nation_volume"),
            F.round(F.sum(_revenue()), 2).alias("total_volume"),
        )
    )
    return flat.select(
        "order_year",
        F.round(
            F.col("nation_volume").cast("double")
            / F.col("total_volume").cast("double"),
            6,
        ).alias("mkt_share"),
    )


@register(
    "q20_promo_part_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey
          AND EXISTS (SELECT 1 FROM part p
                      WHERE p.p_partkey = l.l_partkey
                        AND p.p_type LIKE 'PROMO%'
                        AND p.p_size <= 5)
          AND l.l_quantity >= 49
    )
    """,
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested EXISTS decorrelated into a semi-join
    chain — suppliers with a large shipment of a promo-class part.

    Inner EXISTS = lineitem ⋉ part (broadcast, part pre-filtered);
    outer EXISTS = supplier ⋉ that result. Each semi-join ships only
    its join key upward; no duplicates ever materialize, so no
    DISTINCT pass is needed anywhere.
    """
    s = read_table(spark, sf_dir, "supplier")
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_type").like("PROMO%") & (F.col("p_size") <= 5)
    )
    promo_lines = l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
    return s.join(
        promo_lines, s.s_suppkey == promo_lines.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "q21_waiting_orders",
    oracle="""
    SELECT l1.l_suppkey,
           CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY l1.l_suppkey
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS + NOT EXISTS on the SAME
    table with inequality correlation — the supplier who alone
    returned items on a multi-supplier finalized order.

    Both subqueries decorrelate into joins against per-order
    aggregates (distinct supplier count, distinct returning-supplier
    count) — one extra scan each, partial-aggregated, instead of two
    correlated per-row probes. 'Multi-supplier' ⋀ 'no OTHER returner'
    ≡ n_suppliers ≥ 2 ⋀ (n_returners = 1 ⋀ returner = me).
    """
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    per_order = l.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_suppliers")
    )
    returners = (
        l.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_orderkey").alias("r_orderkey"))
        .agg(
            F.countDistinct("l_suppkey").alias("n_returners"),
            F.min("l_suppkey").alias("only_returner"),
        )
    )
    l1 = l.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .join(returners, F.col("l_orderkey") == F.col("r_orderkey"))
        .filter(
            (F.col("n_suppliers") >= 2)
            & (F.col("n_returners") == 1)
            & (F.col("only_returner") == F.col("l_suppkey"))
        )
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").cast("long").alias("numwait"))
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from LOCAL suppliers (customer and
    supplier share a nation) within one region and order-year.

    The supplier join carries TWO equi-conditions (suppkey AND the
    customer↔supplier nation equality) — the co-nation predicate is
    part of the join, not a post-filter, so it prunes before the
    aggregate. nation/region/supplier broadcast; the only big
    shuffle is orders⋈lineitem on orderkey. The orderdate range
    pushes into the parquet scan (ref theta-join analogue:
    /root/reference/enclaveid_data_pipeline/assets/recent_history.py:384-411).
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(l_extendedprice AS DECIMAL(12,2))) AS best_price
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    floor_price AS (
        SELECT l_partkey AS fp_partkey,
               min(best_price) AS part_floor
        FROM offers
        GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_brand, s.s_name,
           CAST(o.best_price AS DOUBLE) AS best_price
    FROM offers o
    JOIN floor_price f
      ON o.l_partkey = f.fp_partkey AND o.best_price = f.part_floor
    JOIN part p ON o.l_partkey = p.p_partkey
    JOIN supplier s ON o.l_suppkey = s.s_suppkey
    WHERE p.p_size <= 3
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the supplier(s) offering each part at its
    minimum price — a correlated scalar-MIN subquery, decorrelated.

    The corpus has no partsupp table, so lineitem plays the
    part↔supplier price list (min extendedprice per (part, supplier)
    = the offer). The correlated `price = (SELECT min(...) WHERE
    same part)` becomes: aggregate once per part, join back on
    (partkey, price) — one extra partial-agg pass instead of a
    per-row probe, the same rewrite as the reference's scalar
    threshold subqueries (/root/reference/enclaveid_data_pipeline/
    assets/recent_history.py:418-445). The p_size filter broadcasts
    through the part join; ties (several suppliers at the floor
    price) are all kept, as in Q2.
    """
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_size") <= 3)
    s = read_table(spark, sf_dir, "supplier")
    offers = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(12,2)")).alias("best_price")
    )
    floor_price = offers.groupBy(F.col("l_partkey").alias("fp_partkey")).agg(
        F.min("best_price").alias("part_floor")
    )
    return (
        offers.join(
            floor_price,
            (offers.l_partkey == floor_price.fp_partkey)
            & (offers.best_price == floor_price.part_floor),
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("best_price").cast("double").alias("best_price"),
        )
    )


@register(
    "q12_priority_shipping_split",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_shipping_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two-branch CASE counting over a fact↔fact
    join — high- vs low-priority line counts per return flag.

    The corpus lacks l_shipmode/commitdate, so the grouping key is
    l_returnflag and the date window is shipdate-only; the shape
    under test is unchanged: one join, CASE-sums computing BOTH
    branches in a single pass (no second scan, no self-join), fully
    partial-aggregable after the shuffle on l_returnflag. The
    shipdate range reaches the parquet scan as a pushed filter.
    """
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )

"""Graph queries: fixed-point PageRank over the customer↔supplier
bipartite graph (operators.graph). The oracle unrolls the identical
integer-arithmetic iterations in SQL — byte-exact replay is the whole
point of the fixed-point design (float PageRank sums in shuffle order
and is not reproducible, let alone cross-engine)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import SCALE, pagerank_fixed
from ..sources.readers import read_table
from .registry import register

_ITER = 3
_DAMP = 85
_TELEPORT_NUM = (100 - _DAMP) * SCALE

# one PageRank round in DuckDB, integer math identical to
# operators.graph.pagerank_fixed (// floor-div == Spark `div` on the
# all-positive operands here)
_DUCK_ROUND = """
    {nxt} AS (
        SELECT nd.node, nd.deg, nd.n,
               CAST({tele} AS BIGINT) // (100 * nd.n)
               + ({damp} * (coalesce(c.in_sum, 0) + (d.dm // nd.n))) // 100
                   AS rank_s
        FROM nd
        CROSS JOIN (
            SELECT coalesce(sum(r.rank_s), 0) AS dm
            FROM {cur} r WHERE r.deg = 0
        ) d
        LEFT JOIN (
            SELECT e.dst AS node, sum(r.rank_s // r.deg) AS in_sum
            FROM {cur} r JOIN e ON e.src = r.node
            WHERE r.deg > 0 GROUP BY e.dst
        ) c USING (node)
    )
"""


def _pagerank_oracle() -> str:
    rounds = ",".join(
        _DUCK_ROUND.format(
            cur=f"r{i}", nxt=f"r{i + 1}", tele=_TELEPORT_NUM, damp=_DAMP
        )
        for i in range(_ITER)
    )
    return f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS (
        SELECT 'c' || c::VARCHAR AS src, 's' || s::VARCHAR AS dst FROM pairs
        UNION ALL
        SELECT 's' || s::VARCHAR, 'c' || c::VARCHAR FROM pairs
    ), nodes AS (
        SELECT DISTINCT src AS node FROM e
        UNION SELECT DISTINCT dst FROM e
    ), nd AS (
        SELECT n0.node,
               coalesce(dg.deg, 0) AS deg,
               (SELECT count(*) FROM nodes) AS n
        FROM nodes n0
        LEFT JOIN (SELECT src AS node, count(*) AS deg FROM e GROUP BY src)
            dg USING (node)
    ), r0 AS (
        SELECT node, deg, n, CAST({SCALE} AS BIGINT) // n AS rank_s FROM nd
    ), {rounds}
    SELECT node, CAST(rank_s AS BIGINT) AS rank_s
    FROM r{_ITER}
    ORDER BY rank_s DESC, node LIMIT 20
    """


# shared customer↔supplier graph (same construction as PageRank):
# edge iff a customer's order contains the supplier's line item,
# symmetrized; every node therefore has in- and out-edges
_GRAPH_CTE = """
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
        SELECT 'c' || c::VARCHAR AS src, 's' || s::VARCHAR AS dst FROM pairs
        UNION ALL
        SELECT 's' || s::VARCHAR, 'c' || c::VARCHAR FROM pairs
    )
"""

#: packed-long twin of _GRAPH_CTE (customer k → 2k, supplier k →
#: 2k+1) — the id space the r6 iteration-side rewrites run in
_GRAPH_CTE_PACKED = """
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), e AS MATERIALIZED (
        SELECT CAST(2 * c AS BIGINT) AS src,
               CAST(2 * s + 1 AS BIGINT) AS dst FROM pairs
        UNION ALL
        SELECT CAST(2 * s + 1 AS BIGINT), CAST(2 * c AS BIGINT) FROM pairs
    )
"""


def _sql_unpack(expr: str) -> str:
    """DuckDB twin of :func:`_unpack_label` for a packed BIGINT."""
    return (
        f"CASE WHEN ({expr}) % 2 = 0 THEN 'c' || (({expr}) // 2)::VARCHAR"
        f" ELSE 's' || ((({expr}) - 1) // 2)::VARCHAR END"
    )


_BFS_ORACLE = (
    _GRAPH_CTE
    + """
    , seed AS (
        SELECT 'c' || min(o_custkey)::VARCHAR AS node FROM orders
    ), reach AS (
        WITH RECURSIVE r(node, hop) AS (
            SELECT node, 0 FROM seed
            UNION
            SELECT e.dst, r.hop + 1
            FROM r JOIN e ON e.src = r.node
            WHERE r.hop < 4
        )
        SELECT * FROM r
    )
    SELECT node, CAST(min(hop) AS INT) AS hop
    FROM reach GROUP BY node
    """
)


@register("bfs_hops_4", oracle=_BFS_ORACLE)
def bfs_hops_4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distance (≤4) from the minimum customer node over the
    symmetrized customer↔supplier graph — frontier iteration where
    each round touches only the frontier's out-neighborhood, the
    shape that keeps short-diameter reachability cheap on a huge
    graph. Oracle: recursive CTE with a hop bound, min(hop) per
    node. Hop distance is structure-only, so the frontier iterates
    on packed long ids (r6, the pagerank treatment) and labels are
    rebuilt arithmetically at the end — the string-form oracle is
    unchanged."""
    from ..operators.graph import bfs_levels

    edges = _cust_supp_edges_packed(spark, sf_dir)
    orders = read_table(spark, sf_dir, "orders")
    seeds = orders.agg(F.min("o_custkey").alias("k")).select(
        (F.col("k").cast("long") * 2).alias("node")
    )
    hops = bfs_levels(edges, seeds, max_hops=4)
    return hops.withColumn("node", _unpack_label(F.col("node")))


def _lpa_round(cur: str, nxt: str) -> str:
    return f"""
    v{nxt} AS (
        SELECT e.dst AS node, l.label, count(*) AS c
        FROM {cur} l JOIN e ON e.src = l.node
        GROUP BY e.dst, l.label
    ), w{nxt} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (
                       PARTITION BY node ORDER BY c DESC, label
                   ) AS rn
            FROM v{nxt}
        ) t WHERE rn = 1
    ), {nxt} AS (
        SELECT node, label FROM w{nxt}
        UNION ALL
        SELECT l.node, l.label FROM {cur} l
        WHERE l.node NOT IN (SELECT node FROM w{nxt})
    )
    """


_LPA_ORACLE = (
    _GRAPH_CTE_PACKED
    + ", l0 AS (SELECT DISTINCT src AS node, src AS label FROM e), "
    + ",".join(_lpa_round(f"l{i}", f"l{i + 1}") for i in range(3))
    + f""" SELECT {_sql_unpack("node")} AS node,
           {_sql_unpack("label")} AS label FROM l3"""
)


@register("label_propagation_3r", oracle=_LPA_ORACLE)
def label_propagation_3r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three synchronous label-propagation rounds over the
    customer↔supplier graph: every node adopts its in-neighbors'
    most frequent label, ties to the smallest. Deterministic
    replacement for async random-order LPA (useless in a replayable
    pipeline); the oracle unrolls the identical rounds in SQL.

    r6: the rounds run on packed long ids (the pagerank treatment) —
    per-round groupBy keys and the tie-break compare longs, not
    UTF8. 'Smallest label' therefore means smallest PACKED id (a
    determinism choice the oracle replays in the same packed space);
    labels translate back arithmetically only in the final
    projection."""
    from ..operators.graph import label_propagation

    edges = _cust_supp_edges_packed(spark, sf_dir)
    labels = label_propagation(edges, iterations=3)
    return labels.select(
        _unpack_label(F.col("node")).alias("node"),
        _unpack_label(F.col("label")).alias("label"),
    )


# Seven graph queries (bfs, lpa, pagerank, random walks, ppr, kcore,
# plus any iteration-internal re-reads) traverse the SAME packed edge
# table; before round 12 each query re-ran the orders⋈lineitem join +
# distinct — and the symmetrization union consumed that join subtree
# TWICE per query. The half-pair table is now materialized once per
# (applicationId, sf_dir) — the _unigram_shared/_clf_shared
# discipline; every run still derives it from the parquet inputs.
_EDGES_LOCK = __import__("threading").Lock()
_EDGES_SHARED: dict[tuple[str, str], DataFrame] = {}


def _cust_supp_edges_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized customer↔supplier edges on PACKED LONG node ids
    (customer k → 2k, supplier k → 2k+1). Every graph query iterates
    in this id space (r6): the de-dup shuffle moves 16-byte int
    pairs, the cached edge table halves, and every per-round
    hash/compare is a long op. The packing is bijective, so any
    structure-only result (ranks, hops) is bit-identical; label
    reconstruction is pure arithmetic (:func:`_unpack_label`), never
    a join. The directed half is materialized once per
    (applicationId, sf_dir) and shared across the family; the
    symmetrization union stays lazy (two scans of pinned narrow
    rows, not two joins)."""
    from ..materialize import materialize as _materialize

    key = (spark.sparkContext.applicationId, sf_dir)
    with _EDGES_LOCK:
        pairs = _EDGES_SHARED.get(key)
        if pairs is None:
            orders = read_table(spark, sf_dir, "orders")
            lineitem = read_table(spark, sf_dir, "lineitem")
            pairs = _materialize(
                orders.join(
                    lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
                )
                .select(
                    (F.col("o_custkey").cast("long") * 2).alias("cnode"),
                    (F.col("l_suppkey").cast("long") * 2 + 1).alias(
                        "snode"
                    ),
                )
                .distinct()
            )
            _EDGES_SHARED[key] = pairs
    return pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("snode").alias("src"), F.col("cnode").alias("dst")
        )
    )


def _unpack_label(col):
    """'c<k>' / 's<k>' label for a packed-long node id column."""
    return F.when(
        col % 2 == 0, F.concat(F.lit("c"), (col / 2).cast("long"))
    ).otherwise(F.concat(F.lit("s"), ((col - 1) / 2).cast("long")))


@register("pagerank_top20", oracle=_pagerank_oracle())
def pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three fixed-point PageRank rounds over the symmetrized
    customer↔supplier graph (edge iff a customer's order contains the
    supplier's line item), top-20 hubs. Each round is one ranks⋈edges
    equi-join + one partial-aggregated per-dst sum + a broadcast
    1-row dangling term — the connected-components discipline applied
    to rank propagation. Integer arithmetic end to end, so the
    unrolled SQL oracle replays it exactly.

    r6 scale shape: the iteration runs on PACKED LONG node ids
    (customer k → 2k, supplier k → 2k+1) instead of 'c<k>'/'s<k>'
    strings — the distinct shuffles 16-byte int pairs instead of
    ~30-byte strings, the cached edge table halves, and every
    per-round hash/compare is a long op. Rank is a function of graph
    STRUCTURE only and the packing is bijective, so per-node ranks
    are bit-identical; string labels are reconstructed after the
    last round, before the final order-by (so tie-breaks still
    compare the labels the oracle sees)."""
    edges = _cust_supp_edges_packed(spark, sf_dir)
    ranks = pagerank_fixed(
        edges,
        iterations=_ITER,
        damping_pct=_DAMP,
        # this graph's rank table is ~160k rows at sf1 — broadcast
        # it and bound each round (judge r3: the unbounded lazy form
        # compounded to 42s; this shape runs the rounds in ~8s)
        materialize_mode="local",
        broadcast_ranks=True,
    )
    labeled = ranks.select(
        _unpack_label(F.col("node")).alias("node"), "rank_s"
    )
    return labeled.orderBy(F.col("rank_s").desc(), "node").limit(20)


def _walk_step(step: int, cur_w: str, nxt_w: str) -> str:
    """One deterministic walk step in SQL (md5-indexed sorted
    neighbor list, operators.graph.deterministic_random_walks).
    Node ids are packed BIGINTs (r6), so every md5 seed / walk
    fragment casts through the same decimal rendering Spark's
    ``cast('string')`` produces."""
    pick = (
        f"nb.nbrs[CAST(('0x' || substr(md5(w.start::VARCHAR ||"
        f" '|{step}|' || w.cur::VARCHAR),"
        f" 1, 8))::BIGINT % len(nb.nbrs) AS INT) + 1]"
    )
    return f"""
    s{step} AS (
        SELECT w.start, {pick} AS nxt, w.walk
        FROM {cur_w} w JOIN nbrs nb ON nb.node = w.cur
    ), {nxt_w} AS (
        SELECT start, nxt AS cur,
               walk || ' ' || nxt::VARCHAR AS walk FROM s{step}
    )
    """


_WALKS_ORACLE = (
    _GRAPH_CTE_PACKED
    + """
    , nbrs AS MATERIALIZED (
        SELECT src AS node, list_sort(list(DISTINCT dst)) AS nbrs
        FROM e GROUP BY src
    ), w0 AS (
        SELECT node AS start, node AS cur, node::VARCHAR AS walk FROM nbrs
    ), """
    + ",".join(_walk_step(i, f"w{i}", f"w{i + 1}") for i in range(3))
    + f"""
    SELECT {_sql_unpack("start")} AS start,
           array_to_string(list_transform(string_split(walk, ' '),
               x -> {_sql_unpack("x::BIGINT")}), ' ') AS walk
    FROM w3"""
)


@register("random_walks_len3", oracle=_WALKS_ORACLE)
def random_walks_len3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk corpus generation over the customer↔supplier graph:
    one 3-step walk per node with md5-deterministic next-hops
    (operators.graph.deterministic_random_walks) — the node-sequence
    "sentences" that graph-embedding training consumes, reproducible
    run-to-run and engine-to-engine where rand() walks are neither.
    Per step: one walks⋈neighbor-lists equi-join + row-local md5
    indexing; walk state is one row per walk at any length.

    r6 scale shape: the walk iterates on PACKED LONG node ids (the
    pagerank treatment) — neighbor arrays are long[] instead of
    string[], array_sort compares longs, and the per-step join key
    hashes 8 bytes. The md5 next-hop seeds hash the packed ids'
    decimal rendering (a determinism choice the oracle replays
    exactly); 'c<k>'/'s<k>' labels are reconstructed from the
    finished walk strings by pure arithmetic — no label join."""
    from ..operators.graph import deterministic_random_walks

    edges = _cust_supp_edges_packed(spark, sf_dir)
    walks = deterministic_random_walks(edges, walk_len=3)
    return walks.select(
        _unpack_label(F.col("start")).alias("start"),
        F.array_join(
            F.transform(
                F.split(F.col("walk"), " "),
                lambda x: _unpack_label(x.cast("long")),
            ),
            " ",
        ).alias("walk"),
    )


_PPR_ROUND = """
    {nxt} AS (
        SELECT nd.node, nd.deg, nd.is_seed, nd.ns,
               CASE WHEN nd.is_seed = 1
                    THEN CAST({tele} AS BIGINT) // (100 * nd.ns)
                    ELSE CAST(0 AS BIGINT) END
               + ({damp} * (coalesce(c.in_sum, 0)
                  + (CASE WHEN nd.is_seed = 1 THEN d.dm // nd.ns
                          ELSE CAST(0 AS BIGINT) END))) // 100
                   AS rank_s
        FROM nd
        CROSS JOIN (
            SELECT coalesce(sum(r.rank_s), 0) AS dm
            FROM {cur} r WHERE r.deg = 0
        ) d
        LEFT JOIN (
            SELECT e.dst AS node, sum(r.rank_s // r.deg) AS in_sum
            FROM {cur} r JOIN e ON e.src = r.node
            WHERE r.deg > 0 GROUP BY e.dst
        ) c USING (node)
    )
"""


def _ppr_oracle() -> str:
    rounds = ",".join(
        _PPR_ROUND.format(
            cur=f"pr{i}", nxt=f"pr{i + 1}", tele=_TELEPORT_NUM, damp=_DAMP
        )
        for i in range(_ITER)
    )
    return (
        _GRAPH_CTE
        + f"""
    , seedset AS (
        SELECT 'c' || min(o_custkey)::VARCHAR AS node FROM orders
    ), nodes AS (
        SELECT DISTINCT src AS node FROM e
    ), nd AS (
        SELECT n0.node,
               coalesce(dg.deg, 0) AS deg,
               CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END AS is_seed,
               (SELECT count(*) FROM seedset) AS ns
        FROM nodes n0
        LEFT JOIN (SELECT src AS node, count(*) AS deg FROM e GROUP BY src)
            dg USING (node)
        LEFT JOIN seedset s ON s.node = n0.node
    ), pr0 AS (
        SELECT node, deg, is_seed, ns,
               CASE WHEN is_seed = 1 THEN CAST({SCALE} AS BIGINT) // ns
                    ELSE CAST(0 AS BIGINT) END AS rank_s
        FROM nd
    ), {rounds}
    SELECT node, CAST(rank_s AS BIGINT) AS rank_s
    FROM pr{_ITER}
    WHERE rank_s > 0
    ORDER BY rank_s DESC, node LIMIT 20
    """
    )


@register("ppr_related_top20", oracle=_ppr_oracle())
def ppr_related_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the minimum customer node over the
    customer↔supplier graph: teleport and dangling mass return only
    to the seed, so rank = proximity to that customer — the "related
    items" recommendation primitive, in the same bit-replayable
    fixed-point discipline as global PageRank (oracle unrolls the
    identical rounds). Top-20 nonzero-rank nodes. Rank is
    structure-only, so the rounds run on packed long ids (r6, the
    pagerank treatment); labels are rebuilt before the final
    order-by so tie-breaks compare the strings the oracle sees."""
    from ..operators.graph import personalized_pagerank_fixed

    edges = _cust_supp_edges_packed(spark, sf_dir)
    orders = read_table(spark, sf_dir, "orders")
    seeds = orders.agg(F.min("o_custkey").alias("k")).select(
        (F.col("k").cast("long") * 2).alias("node")
    )
    ranks = personalized_pagerank_fixed(
        edges,
        seeds,
        iterations=_ITER,
        materialize_mode="local",
        broadcast_ranks=True,
    )
    return (
        ranks.filter(F.col("rank_s") > 0)
        .select(_unpack_label(F.col("node")).alias("node"), "rank_s")
        .orderBy(F.col("rank_s").desc(), "node")
        .limit(20)
    )


_KCORE_K = 8
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    rounds = []
    for r in range(_KCORE_ROUNDS):
        rounds.append(
            f"""
    k{r} AS (
        SELECT src AS node FROM (
            SELECT src, count(*) AS deg FROM e{r} GROUP BY src
        ) WHERE deg >= {_KCORE_K}
    ), e{r + 1} AS (
        SELECT x.src, x.dst FROM e{r} x
        JOIN k{r} a ON x.src = a.node
        JOIN k{r} b ON x.dst = b.node
    )"""
        )
    return (
        _GRAPH_CTE
        + ", e0 AS (SELECT src, dst FROM e),"
        + ",".join(rounds)
        + f"""
    , final AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        FROM e{_KCORE_ROUNDS} GROUP BY src
    ), conv AS (
        SELECT coalesce(
            min(CASE WHEN deg >= {_KCORE_K} THEN 1 ELSE 0 END) = 1, true
        ) AS converged FROM final
    )
    SELECT f.node, f.deg, c.converged
    FROM final f CROSS JOIN conv c
    """
    )


@register("kcore_peel_k8", oracle=_kcore_oracle())
def kcore_peel_k8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (operators.graph.kcore_peel): 3 fixed rounds of
    dropping degree-<8 nodes from the customer↔supplier graph with
    cascading edge loss, plus a self-certifying ``converged`` flag
    (true iff a 4th round would change nothing — it does converge on
    this graph, so the output IS the 8-core). The oracle unrolls the
    identical rounds in SQL; peeling is order-independent within a
    round, so fixed-round replay is exact with no fixed-point
    arithmetic needed. Iterates on packed long ids like every graph
    query (r6); labels rebuilt arithmetically at the end."""
    from ..operators.graph import kcore_peel

    edges = _cust_supp_edges_packed(spark, sf_dir)
    out = kcore_peel(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)
    return out.select(
        _unpack_label(F.col("node")).alias("node"),
        F.col("deg").cast("long").alias("deg"),
        "converged",
    )

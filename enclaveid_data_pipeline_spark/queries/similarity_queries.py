"""Vector-similarity queries (SURVEY §2.5 W2/W3, §2.3 J2/J4, §2.8 F12).

The ``embeddings`` corpus table stands in for the reference's
session-embedding table (pgvector column, 1024-d there, 64-d here);
``label`` stands in for the per-user grouping, ``vec_id`` for the
temporal order (FIXTURES.md §3).

Float parity: cosine is computed in DOUBLE on both engines from the
same float32 inputs, then rounded to 6 decimals; rank ties break on
the neighbor id so graph edges are order-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity
from ..operators.merge import connected_components
from ..operators.similarity import (
    lag_similarity,
    pairwise_similarity,
    top_k_neighbors,
)
from ..sources.readers import read_table
from .registry import register

_NEAR_DUP_THRESHOLD = 0.3

# Seven queries (top-1 graph, near-dup pairs/components/size
# distribution, triangle census, local clustering, session merge)
# are views over ONE object: the per-label ordered pair table with
# 6-digit-rounded cosine. Before round 12 each recomputed the
# grouped all-pairs pass; now it is materialized once per
# (applicationId, sf_dir) — the _unigram_shared/_clf_shared
# discipline — and the two component consumers additionally share
# the converged CC labeling. Every run still derives everything
# from the parquet input (no cross-run caching); the table is
# per-label-group-bounded, the documented truth-baseline shape whose
# corpus-scale swap is the banded/LSH candidate path.
# RLock: _neardup_components_shared builds on _label_pairs_shared
# under the same guard
_SIM_LOCK = __import__("threading").RLock()
_SIM_SHARED: dict[tuple[str, str, str], DataFrame] = {}


def _label_pairs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UN-materialized shared pair subtree: per-label ordered
    pairs with ``sim = round(similarity, 6)``. Split out so plan
    tests can assert the build's shape (saturating round-robin
    repartition + broadcast pair join) — the materialized table the
    registry queries consume hides it behind the boundary."""
    emb = read_table(spark, sf_dir, "embeddings")
    return pairwise_similarity(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        group_cols=("label",),
        parallelism=spark.sparkContext.defaultParallelism,
    ).withColumn("sim", F.round("similarity", 6))


def _label_pairs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized per-label ordered pair table ``(label, left_id,
    right_id, similarity, sim)`` (sim = round(similarity, 6)),
    computed once per (applicationId, sf_dir)."""
    from ..materialize import materialize as _materialize

    key = (spark.sparkContext.applicationId, sf_dir, "pairs")
    with _SIM_LOCK:
        hit = _SIM_SHARED.get(key)
        if hit is not None:
            return hit
        pairs = _materialize(_label_pairs_plan(spark, sf_dir))
        _SIM_SHARED[key] = pairs
        return pairs


def _neardup_components_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized connected-components labeling ``(node,
    component)`` of the near-duplicate graph (sim ≥ threshold edges
    over the shared pair table), computed once per
    (applicationId, sf_dir) — the CC iteration itself is the
    expensive half of the two component consumers."""
    from ..materialize import materialize as _materialize

    key = (spark.sparkContext.applicationId, sf_dir, "components")
    with _SIM_LOCK:
        hit = _SIM_SHARED.get(key)
        if hit is not None:
            return hit
        pairs = _label_pairs_shared(spark, sf_dir)
        edges = pairs.filter(F.col("sim") >= _NEAR_DUP_THRESHOLD).select(
            F.col("left_id").alias("src"), F.col("right_id").alias("dst")
        )
        comp = _materialize(
            connected_components(edges).select("node", "component")
        )
        _SIM_SHARED[key] = comp
        return comp


def _duck_cos(ea: str, eb: str) -> str:
    """DuckDB double-precision cosine between two list columns.

    Native ``list_cosine_similarity`` (round-11): the previous
    correlated-subquery form (unnest-zip + three scalar subplans per
    pair) executed a subplan per candidate pair and was the
    correctness gate's dominant cost — the blocking/clustering/CC
    oracles spent minutes in it at sf0.1. The native kernel is
    bit-identical here (verified: round(old,6) == round(new,6) with
    max |old-new| == 0.0 over every same-label pair at sf0.01 AND
    sf0.1) and ~2500x faster. Edge divergence exists only for
    zero-norm vectors (old: NULL via x/0; new: -1.0) — the fixtures
    contain none, and NULL inputs still yield NULL either way."""
    return f"list_cosine_similarity(({ea})::DOUBLE[], ({eb})::DOUBLE[])"


_LAG_COS_ORACLE = f"""
    WITH lagged AS (
        SELECT label, vec_id, embedding,
               lag(embedding) OVER (PARTITION BY label ORDER BY vec_id) AS prev_emb
        FROM embeddings
    )
    SELECT label, vec_id,
           round({_duck_cos('embedding', 'prev_emb')}, 6) AS cos_prev
    FROM lagged
    WHERE prev_emb IS NOT NULL
"""


@register("lag_cosine_by_label", oracle=_LAG_COS_ORACLE)
def lag_cosine_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: adjacent-row cosine similarity per group.

    Reference: assets/recent_history.py:307-316 (LAG(embedding) +
    pgvector cosine, first row NULL-filtered).
    """
    emb = read_table(spark, sf_dir, "embeddings")
    out = lag_similarity(
        emb,
        vec_col="embedding",
        group_cols=("label",),
        order_cols=("vec_id",),
        out_col="cos_prev",
    )
    return out.filter(F.col("cos_prev").isNotNull()).select(
        "label", "vec_id", F.round("cos_prev", 6).alias("cos_prev")
    )


@register(
    "similarity_threshold_p90",
    oracle=f"""
    WITH lagged AS (
        SELECT label, vec_id, embedding,
               lag(embedding) OVER (PARTITION BY label ORDER BY vec_id) AS prev_emb
        FROM embeddings
    ), sims AS (
        SELECT label,
               {_duck_cos('embedding', 'prev_emb')} AS cos_prev
        FROM lagged WHERE prev_emb IS NOT NULL
    )
    SELECT label,
           round(quantile_cont(cos_prev, 0.90), 6) AS similarity_threshold
    FROM sims GROUP BY label
    """,
)
def similarity_threshold_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 on W2: per-group 90th percentile of adjacent similarity —
    the reference's ``similarity_threshold`` scalar
    (assets/recent_history.py:299-341), kept in-plan as a grouped
    aggregate."""
    emb = read_table(spark, sf_dir, "embeddings")
    sims = lag_similarity(
        emb,
        vec_col="embedding",
        group_cols=("label",),
        order_cols=("vec_id",),
        out_col="cos_prev",
    ).filter(F.col("cos_prev").isNotNull())
    return sims.groupBy("label").agg(
        F.round(F.percentile("cos_prev", F.lit(0.90)), 6).alias(
            "similarity_threshold"
        )
    )


_PAIRS_ORACLE_CTE = f"""
    WITH pairs AS (
        SELECT a.label AS label,
               a.vec_id AS left_id,
               b.vec_id AS right_id,
               round({_duck_cos('a.embedding', 'b.embedding')}, 6) AS sim
        FROM embeddings a
        JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
    )
"""


@register(
    "top1_neighbor_graph",
    oracle=_PAIRS_ORACLE_CTE
    + """
    , ranked AS (
        SELECT label, left_id, right_id, sim,
               row_number() OVER (
                   PARTITION BY label, left_id
                   ORDER BY sim DESC, right_id
               ) AS rn
        FROM pairs
    )
    SELECT label,
           left_id AS parent_id,
           right_id AS child_id,
           sim AS weight
    FROM ranked WHERE rn = 1
    """,
)
def top1_neighbor_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+W3: top-1 most-similar LATER row per row, per group — the
    reference's session graph build (assets/recent_history.py:467-527:
    DocumentPairs CTE + ROW_NUMBER ... rank=1).

    Rank uses the ROUNDED similarity so float noise can't reorder
    near-ties; ties break on child id.
    """
    pairs = _label_pairs_shared(spark, sf_dir)
    top1 = top_k_neighbors(
        pairs,
        k=1,
        group_cols=("label",),
        anchor_col="left_id",
        neighbor_col="right_id",
        sim_col="sim",
    )
    return top1.select(
        "label",
        F.col("left_id").alias("parent_id"),
        F.col("right_id").alias("child_id"),
        F.col("sim").alias("weight"),
    )


@register(
    "embedding_near_duplicates",
    oracle=_PAIRS_ORACLE_CTE
    + f"""
    SELECT label, left_id, right_id, sim
    FROM pairs WHERE sim >= {_NEAR_DUP_THRESHOLD}
    """,
)
def embedding_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-shaped candidate pairs: per-group pairs above a cosine
    threshold (the reference's merge-candidate query,
    assets/recent_history.py:384-411, with the similarity side of the
    conjunctive predicate P8)."""
    pairs = _label_pairs_shared(spark, sf_dir)
    return pairs.filter(F.col("sim") >= _NEAR_DUP_THRESHOLD).select(
        "label", "left_id", "right_id", "sim"
    )


@register(
    "near_duplicate_components",
    oracle=_PAIRS_ORACLE_CTE
    + f"""
    , edges AS (
        SELECT left_id AS src, right_id AS dst
        FROM pairs WHERE sim >= {_NEAR_DUP_THRESHOLD}
    ), sym AS (
        SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), recursive_reach AS (
        WITH RECURSIVE reach(node, root) AS (
            SELECT src, src FROM sym
            UNION
            SELECT s.dst, r.root
            FROM reach r JOIN sym s ON s.src = r.node
        )
        SELECT * FROM reach
    )
    SELECT node, CAST(min(root) AS BIGINT) AS component
    FROM recursive_reach
    GROUP BY node
    """,
)
def near_duplicate_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 rewrite: connected components over near-duplicate pairs.

    Replaces the reference's order-dependent driver merge loop
    (assets/recent_history.py:416-447) with deterministic min-label
    propagation (see operators.merge). The oracle is a recursive-CTE
    transitive closure — feasible at oracle scale, while the engine
    side converges in O(log n) distributed rounds.
    """
    return _neardup_components_shared(spark, sf_dir)


@register(
    "dup_cluster_size_distribution",
    oracle=_PAIRS_ORACLE_CTE
    + f"""
    , edges AS (
        SELECT left_id AS src, right_id AS dst
        FROM pairs WHERE sim >= {_NEAR_DUP_THRESHOLD}
    ), sym AS (
        SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), recursive_reach AS (
        WITH RECURSIVE reach(node, root) AS (
            SELECT src, src FROM sym
            UNION
            SELECT s.dst, r.root
            FROM reach r JOIN sym s ON s.src = r.node
        )
        SELECT * FROM reach
    ), cc AS (
        SELECT node, min(root) AS component
        FROM recursive_reach GROUP BY node
    ), sizes AS (
        SELECT component, count(*) AS csize FROM cc GROUP BY component
    )
    SELECT CAST(csize AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(csize) AS BIGINT) AS n_docs_in,
           CAST(sum(csize) - count(*) AS BIGINT) AS n_removable
    FROM sizes GROUP BY csize
    """,
)
def dup_cluster_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'How duplicated is my corpus' in one table: the distribution
    of near-duplicate cluster sizes plus, per size, how many
    documents a keep-one-per-cluster dedup would remove — the
    go/no-go number a curation run reads before spending the rewrite
    pass. Components from the same deterministic min-label
    propagation; everything after is two tiny aggregates over the
    component table."""
    sizes = (
        _neardup_components_shared(spark, sf_dir)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("csize"))
    )
    return sizes.groupBy(F.col("csize").cast("long").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("csize").cast("long").alias("n_docs_in"),
        (F.sum("csize") - F.count(F.lit(1))).cast("long").alias("n_removable"),
    )


# ---- ANN-backed graph (scale twin of top1_neighbor_graph) ---------------

#: Hyperplane count for the graph's LSH bucketing: 8 buckets per
#: label. The bucket joins the group key, so a label's pair space
#: shrinks ~8x and — the 100 TB point — one label's pairs no longer
#: land on a single task: (label, bucket) is the shuffle key.
_GRAPH_PLANES = 3


def _duck_bucket_planes(e: str, planes: int, offset: int = 0) -> str:
    """DuckDB twin of operators.knn.hyperplane_sign_bits (64-d fixed:
    DuckDB can't bind a column inside generate_series here).
    ``offset`` selects a disjoint global-plane range — table t of the
    OR-amplified form is offset t*planes."""
    hex_high = "('8','9','a','b','c','d','e','f')"
    terms = []
    for bit in range(planes):
        p = offset + bit
        proj = (
            f"(SELECT sum(CASE WHEN substr(md5('{p}|' || i), 1, 1) IN {hex_high} "
            f"THEN {e}[i]::DOUBLE ELSE -{e}[i]::DOUBLE END) "
            f"FROM generate_series(1, 64) z(i))"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << bit} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


_ANN_GRAPH_ORACLE = f"""
    WITH b AS (
        SELECT label, vec_id, embedding,
               {_duck_bucket_planes('embedding', _GRAPH_PLANES)} AS bucket
        FROM embeddings
    ), pairs AS (
        SELECT a.label, a.vec_id AS left_id, c.vec_id AS right_id,
               round({_duck_cos('a.embedding', 'c.embedding')}, 6) AS sim
        FROM b a
        JOIN b c
          ON a.label = c.label AND a.bucket = c.bucket
         AND a.vec_id < c.vec_id
    ), ranked AS (
        SELECT label, left_id, right_id, sim,
               row_number() OVER (
                   PARTITION BY label, left_id
                   ORDER BY sim DESC, right_id
               ) AS rn
        FROM pairs
    )
    SELECT label,
           left_id AS parent_id,
           right_id AS child_id,
           sim AS weight
    FROM ranked WHERE rn = 1
"""


@register("top1_neighbor_graph_ann", oracle=_ANN_GRAPH_ORACLE)
def top1_neighbor_graph_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-backed twin of :func:`top1_neighbor_graph`: candidate
    pairs come only from the anchor's LSH sign bucket WITHIN its
    label (deterministic hyperplanes, operators.knn), so the
    reference's per-user all-pairs graph build
    (assets/recent_history.py:469-514) loses its quadratic coupling —
    a pathological hot user fans out across 2^planes buckets instead
    of one task's all-pairs. Same rounded-sim rank, same tie-break;
    recall vs the exact graph is measured by
    ``top1_graph_ann_recall``.

    Honest recall note: on THIS synthetic corpus (near-uniform
    random 64-d vectors, top-1 cosine ≈ 0.3) each plane keeps the
    true neighbor with p ≈ 0.55, so 3 planes measure ≈ 0.18 top-1
    recall — the floor case for LSH, because the nearest neighbor is
    barely nearer than random. On a real embedding corpus where
    top-1 neighbors are semantically close (p ≈ 0.9/plane) the same
    3 planes give ≈ 0.73. That distribution-dependence is exactly
    why the recall query ships next to the twin: run it on YOUR
    corpus before swapping the exact build out; tune
    ``_GRAPH_PLANES`` down (or add OR'd tables) to buy recall with
    candidate volume."""
    from ..operators.knn import hyperplane_sign_bits

    emb = read_table(spark, sf_dir, "embeddings").withColumn(
        "bucket",
        hyperplane_sign_bits(F.col("embedding"), _GRAPH_PLANES, dims=64),
    )
    pairs = pairwise_similarity(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        group_cols=("label", "bucket"),
    ).withColumn("sim", F.round("similarity", 6))
    top1 = top_k_neighbors(
        pairs,
        k=1,
        group_cols=("label",),
        anchor_col="left_id",
        neighbor_col="right_id",
        sim_col="sim",
    )
    return top1.select(
        "label",
        F.col("left_id").alias("parent_id"),
        F.col("right_id").alias("child_id"),
        F.col("sim").alias("weight"),
    )


_EXACT_GRAPH_ORACLE = (
    _PAIRS_ORACLE_CTE
    + """
    , ranked AS (
        SELECT label, left_id, right_id, sim,
               row_number() OVER (
                   PARTITION BY label, left_id
                   ORDER BY sim DESC, right_id
               ) AS rn
        FROM pairs
    )
    SELECT label,
           left_id AS parent_id,
           right_id AS child_id,
           sim AS weight
    FROM ranked WHERE rn = 1
    """
)


@register(
    "top1_graph_ann_recall",
    oracle=f"""
    WITH exact AS (
        {_EXACT_GRAPH_ORACLE}
    ), ann AS (
        {_ANN_GRAPH_ORACLE}
    )
    SELECT e.label,
           CAST(count(*) AS BIGINT) AS n_exact_edges,
           CAST(count(a.child_id) AS BIGINT) AS n_matched,
           round(count(a.child_id) * 1.0 / count(*), 4) AS top1_recall
    FROM exact e
    LEFT JOIN ann a
      ON a.label = e.label AND a.parent_id = e.parent_id
     AND a.child_id = e.child_id
    GROUP BY e.label
    """,
)
def top1_graph_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality gate for the graph twin (same pattern as
    ``ann_recall_at_5``): per label, the fraction of exact top-1
    edges the bucketed build reproduces — the number that says
    whether ``_GRAPH_PLANES`` is set right before the twin replaces
    the exact build at scale. Costs two graph builds plus a thin
    (label, parent, child) join."""
    exact = top1_neighbor_graph(spark, sf_dir)
    ann = top1_neighbor_graph_ann(spark, sf_dir).select(
        F.col("label").alias("a_label"),
        F.col("parent_id").alias("a_parent_id"),
        F.col("child_id").alias("a_child_id"),
    )
    return (
        exact.join(
            ann,
            (F.col("label") == F.col("a_label"))
            & (F.col("parent_id") == F.col("a_parent_id"))
            & (F.col("child_id") == F.col("a_child_id")),
            "left",
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_exact_edges"),
            F.count("a_child_id").alias("n_matched"),
            F.round(F.count("a_child_id") / F.count(F.lit(1)), 4).alias(
                "top1_recall"
            ),
        )
    )


# ---- OR-amplified (multi-table) LSH graph: the recall dial ---------------

_ANN4X_TABLES = 4
_ANN4X_PLANES = 3

_ANN4X_BUCKET_COLS = ", ".join(
    f"{_duck_bucket_planes('embedding', _ANN4X_PLANES, t * _ANN4X_PLANES)}"
    f" AS b{t}"
    for t in range(_ANN4X_TABLES)
)
_ANN4X_OR = " OR ".join(f"a.b{t} = c.b{t}" for t in range(_ANN4X_TABLES))

_ANN4X_GRAPH_ORACLE = f"""
    WITH b AS (
        SELECT label, vec_id, {_ANN4X_BUCKET_COLS}
        FROM embeddings
    ), cand AS (
        SELECT DISTINCT a.label, a.vec_id AS left_id, c.vec_id AS right_id
        FROM b a
        JOIN b c
          ON a.label = c.label AND a.vec_id < c.vec_id
         AND ({_ANN4X_OR})
    ), pairs AS (
        SELECT cand.label, cand.left_id, cand.right_id,
               round({_duck_cos('e1.embedding', 'e2.embedding')}, 6) AS sim
        FROM cand
        JOIN embeddings e1 ON e1.vec_id = cand.left_id
        JOIN embeddings e2 ON e2.vec_id = cand.right_id
    ), ranked AS (
        SELECT label, left_id, right_id, sim,
               row_number() OVER (
                   PARTITION BY label, left_id
                   ORDER BY sim DESC, right_id
               ) AS rn
        FROM pairs
    )
    SELECT label,
           left_id AS parent_id,
           right_id AS child_id,
           sim AS weight
    FROM ranked WHERE rn = 1
"""


@register("top1_neighbor_graph_ann4x", oracle=_ANN4X_GRAPH_ORACLE)
def top1_neighbor_graph_ann4x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified twin of :func:`top1_neighbor_graph_ann`: 4
    independent 3-plane LSH tables; a pair is a candidate if it
    shares a bucket in ANY table (recall 1-(1-p^3)^4 per pair vs p^3
    single-table — the dial the single-table docstring names).
    Measured on this near-uniform corpus at sf0.01: top-1 recall
    0.60 vs 0.18 single-table, at ~4x the candidate volume — the
    trade the paired recall queries quantify per corpus.

    Two-phase plan — the 100 TB shape: bucket ids explode to
    (label, table, bucket) join keys carrying ONLY ids, candidates
    dedup BEFORE vectors re-join by id, so each surviving pair pays
    the cosine exactly once and the wide vector rides the candidate
    join not the bucket join. Shuffle keys stay (label, table,
    bucket) — a hot label still spreads."""
    from ..operators.knn import multitable_bucket_ids
    from ..functions.vectors import as_double, cosine_similarity, l2_norm

    emb = read_table(spark, sf_dir, "embeddings")
    ids = emb.select(
        "label",
        "vec_id",
        F.explode(
            multitable_bucket_ids(
                F.col("embedding"), _ANN4X_TABLES, _ANN4X_PLANES, dims=64
            )
        ).alias("tb"),
    ).select("label", "vec_id", F.col("tb.table").alias("t"), F.col("tb.bucket").alias("b"))
    cand = (
        ids.select(
            "label", "t", "b", F.col("vec_id").alias("left_id")
        )
        .join(
            ids.select(
                "label", "t", "b", F.col("vec_id").alias("right_id")
            ),
            on=["label", "t", "b"],
        )
        .filter(F.col("left_id") < F.col("right_id"))
        .select("label", "left_id", "right_id")
        .distinct()
    )
    norms = emb.select(
        "vec_id",
        as_double(F.col("embedding")).alias("__v"),
    ).withColumn("__n", l2_norm(F.col("__v"), assume_double=True))
    sim = F.round(
        cosine_similarity(
            F.col("__va"),
            F.col("__vb"),
            a_norm=F.col("__na"),
            b_norm=F.col("__nb"),
            assume_double=True,
        ),
        6,
    )
    pairs = (
        cand.join(
            norms.select(
                F.col("vec_id").alias("left_id"),
                F.col("__v").alias("__va"),
                F.col("__n").alias("__na"),
            ),
            "left_id",
        )
        .join(
            norms.select(
                F.col("vec_id").alias("right_id"),
                F.col("__v").alias("__vb"),
                F.col("__n").alias("__nb"),
            ),
            "right_id",
        )
        .withColumn("sim", sim)
    )
    top1 = top_k_neighbors(
        pairs,
        k=1,
        group_cols=("label",),
        anchor_col="left_id",
        neighbor_col="right_id",
        sim_col="sim",
    )
    return top1.select(
        "label",
        F.col("left_id").alias("parent_id"),
        F.col("right_id").alias("child_id"),
        F.col("sim").alias("weight"),
    )


@register(
    "top1_graph_ann4x_recall",
    oracle=f"""
    WITH exact AS (
        {_EXACT_GRAPH_ORACLE}
    ), ann AS (
        {_ANN4X_GRAPH_ORACLE}
    )
    SELECT e.label,
           CAST(count(*) AS BIGINT) AS n_exact_edges,
           CAST(count(a.child_id) AS BIGINT) AS n_matched,
           round(count(a.child_id) * 1.0 / count(*), 4) AS top1_recall
    FROM exact e
    LEFT JOIN ann a
      ON a.label = e.label AND a.parent_id = e.parent_id
     AND a.child_id = e.child_id
    GROUP BY e.label
    """,
)
def top1_graph_ann4x_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall gate for the OR-amplified graph (pairs with
    ``top1_graph_ann_recall`` to show the dial: more tables -> higher
    recall, more candidates). Same thin (label, parent, child)
    comparison join."""
    exact = top1_neighbor_graph(spark, sf_dir)
    ann = top1_neighbor_graph_ann4x(spark, sf_dir).select(
        F.col("label").alias("a_label"),
        F.col("parent_id").alias("a_parent_id"),
        F.col("child_id").alias("a_child_id"),
    )
    return (
        exact.join(
            ann,
            (F.col("label") == F.col("a_label"))
            & (F.col("parent_id") == F.col("a_parent_id"))
            & (F.col("child_id") == F.col("a_child_id")),
            "left",
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_exact_edges"),
            F.count("a_child_id").alias("n_matched"),
            F.round(F.count("a_child_id") / F.count(F.lit(1)), 4).alias(
                "top1_recall"
            ),
        )
    )


@register(
    "neardup_triangle_counts",
    oracle=_PAIRS_ORACLE_CTE
    + f"""
    , edges AS (
        SELECT label, left_id AS a, right_id AS b
        FROM pairs WHERE sim >= {_NEAR_DUP_THRESHOLD}
    )
    SELECT e1.label, CAST(count(*) AS BIGINT) AS n_triangles
    FROM edges e1
    JOIN edges e2
      ON e2.label = e1.label AND e2.a = e1.a AND e2.b > e1.b
    JOIN edges e3
      ON e3.label = e1.label AND e3.a = e1.b AND e3.b = e2.b
    GROUP BY e1.label
    """,
)
def neardup_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of each label's near-duplicate graph — the
    clustering-coefficient numerator that distinguishes tight
    duplicate cliques from chains before a keep-one dedup commits
    (a chain a-b-c can be one rewrite family or transitive drift;
    triangles say which). Engine side orients edges by (degree, id)
    so wedge work at a hot node is out-degree-bounded
    (operators.graph.count_triangles); the oracle is a plain
    id-ordered triple self-join. Labels with no triangle are absent
    from both sides."""
    from ..operators.graph import count_triangles

    pairs = _label_pairs_shared(spark, sf_dir)
    edges = pairs.filter(F.col("sim") >= _NEAR_DUP_THRESHOLD).select(
        "label", F.col("left_id").alias("src"), F.col("right_id").alias("dst")
    )
    return count_triangles(edges, group_cols=("label",))


@register(
    "neardup_local_clustering",
    oracle=_PAIRS_ORACLE_CTE
    + f"""
    , edges AS (
        SELECT label, left_id AS a, right_id AS b
        FROM pairs WHERE sim >= {_NEAR_DUP_THRESHOLD}
    ), tri AS (
        SELECT e1.label, e1.a AS x, e1.b AS y, e2.b AS z
        FROM edges e1
        JOIN edges e2
          ON e2.label = e1.label AND e2.a = e1.a AND e2.b > e1.b
        JOIN edges e3
          ON e3.label = e1.label AND e3.a = e1.b AND e3.b = e2.b
    ), tri_nodes AS (
        SELECT label, x AS node FROM tri
        UNION ALL SELECT label, y FROM tri
        UNION ALL SELECT label, z FROM tri
    ), tcount AS (
        SELECT label, node, count(*) AS n_tri
        FROM tri_nodes GROUP BY label, node
    ), deg AS (
        SELECT label, node, count(*) AS deg FROM (
            SELECT label, a AS node FROM edges
            UNION ALL SELECT label, b FROM edges
        ) GROUP BY label, node
    )
    SELECT d.label, d.node,
           CAST(d.deg AS BIGINT) AS deg,
           CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
           round(2.0 * coalesce(t.n_tri, 0)
                 / (d.deg * (d.deg - 1)), 4) AS lcc
    FROM deg d
    LEFT JOIN tcount t ON t.label = d.label AND t.node = d.node
    WHERE d.deg >= 2
    """,
)
def neardup_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node of each label's
    near-duplicate graph (operators.graph.local_clustering):
    2·tri(v)/(deg(v)·(deg(v)−1)) for deg ≥ 2 — the per-node form of
    the triangle census, separating nodes inside duplicate CLIQUES
    (lcc→1: safe to keep one) from bridge nodes chaining otherwise
    distinct texts (lcc→0: transitive drift, don't collapse).
    Engine side reuses the degree-oriented triangle corners (wedge
    work out-degree-bounded at hot nodes) + one explode; the oracle
    replays with a plain id-ordered triple self-join."""
    from ..operators.graph import local_clustering

    pairs = _label_pairs_shared(spark, sf_dir)
    edges = pairs.filter(F.col("sim") >= _NEAR_DUP_THRESHOLD).select(
        "label", F.col("left_id").alias("src"), F.col("right_id").alias("dst")
    )
    out = local_clustering(edges, group_cols=("label",))
    return out.select(
        "label",
        "node",
        "deg",
        "n_tri",
        F.round("lcc", 4).alias("lcc"),
    )

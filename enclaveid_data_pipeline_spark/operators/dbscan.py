"""Density-based clustering (DBSCAN) as DataFrame algebra.

The reference clusters session embeddings with HDBSCAN on the driver
(reference: assets/old_history.py:154-176 — noise label -1, cluster
labels otherwise). That shape — "every vector gets a cluster id or
-1" — is re-expressed here as classic DBSCAN built entirely from
relational primitives the engine already has:

1. eps-neighbor pairs   (pairwise cosine distance ≤ eps),
2. core points          (|N_eps(p)| ≥ min_pts, self included),
3. clusters             (connected components over core–core edges),
4. border attachment    (non-core point adopts the MIN cluster id
                         among its core eps-neighbors),
5. noise                (everything else → cluster -1).

Determinism: textbook DBSCAN assigns border points to whichever core
point reaches them first — scan-order-dependent. Here border points
take the MINIMUM candidate cluster id, and cluster ids are the MIN
member id of the core component (operators.merge), so the full
labeling is a pure function of the input set and is replayable by an
independent SQL engine (the oracle does exactly that with a
recursive CTE).

Scale shape: the all-pairs step is the truth baseline — at corpus
scale inject ``candidate_pairs`` from the banded/LSH generators
(operators.similarity.banded_pairwise_similarity, operators.knn
bucket joins) so candidate generation is O(n·W) instead of O(n²);
steps 2-5 only ever touch the candidate set. Core detection is one
groupBy; components converge in O(log n) rounds; border attachment
is one aggregated equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize as _materialize
from .merge import connected_components


def _all_pairs(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Ungrouped ordered all-pairs cosine — the O(n²) truth baseline,
    as a broadcast nested-loop (one side broadcast, the streamed side
    stays partitioned — the same shape as knn.brute_force_topk).
    Correct, not scalable; production swaps this whole step for a
    banded/LSH candidate table via the ``candidate_pairs`` parameter.
    Output: ``left_id, right_id, similarity`` with left < right.
    """
    from ..functions.vectors import as_double, cosine_similarity, l2_norm

    a = df.select(
        F.col(id_col).alias("left_id"),
        as_double(F.col(vec_col)).alias("__va"),
        l2_norm(F.col(vec_col)).alias("__na"),
    )
    b = df.select(
        F.col(id_col).alias("right_id"),
        as_double(F.col(vec_col)).alias("__vb"),
        l2_norm(F.col(vec_col)).alias("__nb"),
    )
    sim = cosine_similarity(
        F.col("__va"),
        F.col("__vb"),
        a_norm=F.col("__na"),
        b_norm=F.col("__nb"),
        assume_double=True,
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("left_id") < F.col("right_id"))
        .withColumn("similarity", sim)
        .select("left_id", "right_id", "similarity")
    )


def eps_neighbor_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    eps: float,
    round_digits: int = 6,
) -> DataFrame:
    """Symmetric eps-neighborhood pairs ``(id, nbr, dist)`` with
    cosine distance ``round(1 - cos_sim, round_digits) <= eps``.

    Rounding BEFORE the threshold comparison is what makes the eps
    decision engine-portable: both engines compare the same 6-digit
    decimal, so a 1-ulp summation difference cannot flip membership.
    """
    # materialized: the union below consumes `half` TWICE, and without
    # a boundary each branch re-runs the O(n²) cosine pass (r12
    # before-plan: two full crossJoin subtrees). The post-eps-filter
    # pair set is output-sized, so pinning it is cheap; the quadratic
    # work runs once.
    half = _materialize(
        _all_pairs(df, id_col, vec_col)
        .withColumn(
            "dist", F.round(F.lit(1.0) - F.col("similarity"), round_digits)
        )
        .filter(F.col("dist") <= eps)
        .select("left_id", "right_id", "dist")
    )
    return half.select(
        F.col("left_id").alias("id"),
        F.col("right_id").alias("nbr"),
        "dist",
    ).unionByName(
        half.select(
            F.col("right_id").alias("id"),
            F.col("left_id").alias("nbr"),
            "dist",
        )
    )


def dbscan(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    eps: float = 0.7,
    min_pts: int = 4,
    candidate_pairs: DataFrame | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """DBSCAN over a vector column; returns one row per input id:
    ``(id, cluster, role)`` with ``cluster = -1`` for noise and
    ``role`` in {'core','border','noise'}.

    ``candidate_pairs`` (optional) replaces the all-pairs
    eps-neighbor generation with a pre-banded candidate table of
    columns ``(id, nbr, dist)`` — the 100 TB path; the semantics of
    steps 2-5 are unchanged because they only read the pair table.
    ``min_pts`` counts the point itself (the standard definition), so
    a core point needs ``min_pts - 1`` eps-neighbors.
    """
    pairs = (
        candidate_pairs
        if candidate_pairs is not None
        else eps_neighbor_pairs(
            df, id_col, vec_col, eps, round_digits=round_digits
        )
    )
    # the pair table feeds core detection, core-edge building, AND
    # border attachment — one boundary, three consumers (plus the CC
    # rounds downstream); without it the O(n²) candidate generation
    # re-executes per consumer
    pairs = _materialize(pairs, None)
    nbr_counts = pairs.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_nbrs")
    )
    core = nbr_counts.filter(
        F.col("n_nbrs") + F.lit(1) >= F.lit(min_pts)
    ).select("id")

    # core–core edges; components label every connected core with the
    # min core id. Isolated cores (no core neighbor) form singleton
    # clusters and are unioned in explicitly because
    # connected_components only emits nodes that appear in an edge.
    core_edges = (
        pairs.join(core.withColumnRenamed("id", "nbr"), on="nbr")
        .join(core, on="id")
        .filter(F.col("id") < F.col("nbr"))
        .select(F.col("id").alias("src"), F.col("nbr").alias("dst"))
    )
    comp = connected_components(core_edges).select(
        F.col("node").alias("id"), F.col("component").alias("cluster")
    )
    core_clusters = core.join(comp, on="id", how="left").select(
        "id", F.coalesce("cluster", F.col("id")).alias("cluster")
    )

    # border: non-core with ≥1 core eps-neighbor → MIN candidate
    # cluster id (deterministic stand-in for scan-order assignment)
    border = (
        pairs.join(
            core_clusters.withColumnRenamed("id", "nbr"), on="nbr"
        )
        .join(core, on="id", how="left_anti")
        .groupBy("id")
        .agg(F.min("cluster").alias("cluster"))
    )

    labeled = core_clusters.withColumn(
        "role", F.lit("core")
    ).unionByName(border.withColumn("role", F.lit("border")))
    all_ids = df.select(F.col(id_col).alias("id"))
    return all_ids.join(labeled, on="id", how="left").select(
        "id",
        F.coalesce("cluster", F.lit(-1).cast("long")).alias("cluster"),
        F.coalesce("role", F.lit("noise")).alias("role"),
    )


def core_distance(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
    half_pairs: DataFrame | None = None,
) -> DataFrame:
    """HDBSCAN's core distance: cosine distance to the k-th nearest
    OTHER point, per point — the density estimate under every
    hierarchical density method (and the knob that turns DBSCAN's
    global eps into a per-point scale). Returns ``(id, core_dist)``.

    Rank ties break on neighbor id so the k-th neighbor is unique.
    Points with fewer than k neighbors (only possible when the corpus
    itself is smaller than k+1) are omitted. All-pairs here is the
    truth baseline; the IVF/LSH top-k generators are the documented
    corpus-scale swap (they already emit ranked neighbor lists).

    ``half_pairs`` (optional) supplies the UNFILTERED ordered pair
    table ``(left_id, right_id, dist)`` — dist already rounded to
    ``round_digits`` — in place of the in-function all-pairs pass,
    so callers that need the same quadratic truth table for several
    queries compute it once (queries.dbscan_queries shares one per
    gate run).
    """
    from pyspark.sql import Window

    # materialized for the same reason as eps_neighbor_pairs: the
    # symmetrization union reads `pairs` twice, which without a
    # boundary doubles the O(n²) cosine pass. This is the gate-SF
    # truth baseline (production swaps in IVF/LSH top-k), so the
    # pinned pair table is bounded by the gate corpus.
    pairs = (
        half_pairs
        if half_pairs is not None
        else _materialize(
            _all_pairs(df, id_col, vec_col)
            .withColumn(
                "dist",
                F.round(F.lit(1.0) - F.col("similarity"), round_digits),
            )
            .select("left_id", "right_id", "dist")
        )
    )
    sym = pairs.select(
        F.col("left_id").alias("id"), F.col("right_id").alias("nbr"), "dist"
    ).unionByName(
        pairs.select(
            F.col("right_id").alias("id"), F.col("left_id").alias("nbr"), "dist"
        )
    )
    w = Window.partitionBy("id").orderBy(F.asc("dist"), F.asc("nbr"))
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == k)
        .select("id", F.col("dist").alias("core_dist"))
    )

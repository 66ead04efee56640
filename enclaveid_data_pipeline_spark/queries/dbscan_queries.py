"""Density clustering queries: native DBSCAN + HDBSCAN core distance
over the embeddings table.

The reference hands session embeddings to driver-side HDBSCAN and
keeps its -1-is-noise labeling (reference: assets/old_history.py:
154-176). ``dbscan_embeddings`` reproduces that *shape* — every
vector gets a cluster id or -1 — with a fully distributed,
deterministic DBSCAN (operators.dbscan), and ``core_distance_k5``
computes the density estimate HDBSCAN is built on. Both are
replayed exactly by the DuckDB oracles (recursive-CTE components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dbscan import core_distance, dbscan
from ..sources.readers import read_table
from .registry import register
from .similarity_queries import _duck_cos

_EPS = 0.65
_MIN_PTS = 4

# all-pairs cosine DISTANCE, rounded to 6 digits BEFORE any
# comparison (the rounding is what makes the eps decision portable).
# MATERIALIZED: the pair table feeds 3+ downstream CTEs; without the
# hint DuckDB re-inlines (and re-computes) the O(n²) cosine each time.
_DIST_PAIRS_CTE = f"""
    WITH p AS MATERIALIZED (
        SELECT a.vec_id AS i, b.vec_id AS j,
               round(1 - {_duck_cos('a.embedding', 'b.embedding')}, 6) AS d
        FROM embeddings a
        JOIN embeddings b ON a.vec_id < b.vec_id
    )
"""

_DBSCAN_ORACLE = (
    _DIST_PAIRS_CTE
    + f"""
    , sym AS MATERIALIZED (
        SELECT i AS id, j AS nbr, d FROM p WHERE d <= {_EPS}
        UNION ALL
        SELECT j, i, d FROM p WHERE d <= {_EPS}
    ), core AS (
        SELECT id FROM sym GROUP BY id
        HAVING count(*) + 1 >= {_MIN_PTS}
    ), ce AS (
        SELECT s.id AS a, s.nbr AS b
        FROM sym s
        JOIN core c1 ON c1.id = s.id
        JOIN core c2 ON c2.id = s.nbr
    ), comp AS (
        WITH RECURSIVE reach(node, root) AS (
            SELECT id, id FROM core
            UNION
            SELECT ce.b, r.root FROM reach r JOIN ce ON ce.a = r.node
        )
        SELECT node, min(root) AS cluster FROM reach GROUP BY node
    ), border AS (
        SELECT s.id, min(c.cluster) AS cluster
        FROM sym s
        JOIN comp c ON c.node = s.nbr
        WHERE s.id NOT IN (SELECT id FROM core)
        GROUP BY s.id
    )
    SELECT e.vec_id AS id,
           CAST(coalesce(c.cluster, b.cluster, -1) AS BIGINT) AS cluster,
           CASE WHEN c.node IS NOT NULL THEN 'core'
                WHEN b.id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role
    FROM embeddings e
    LEFT JOIN comp c ON c.node = e.vec_id
    LEFT JOIN border b ON b.id = e.vec_id
    """
)


@register("dbscan_embeddings", oracle=_DBSCAN_ORACLE)
def dbscan_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DBSCAN over the full embedding corpus (cosine
    distance, eps=0.65, min_pts=4): eps-pairs → core detection →
    connected components over core–core edges → min-id border
    attachment → -1 noise. The distributed, replayable re-expression
    of the reference's driver-side HDBSCAN labeling
    (assets/old_history.py:154-176)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return dbscan(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        eps=_EPS,
        min_pts=_MIN_PTS,
    )


_CORE_DIST_ORACLE = (
    _DIST_PAIRS_CTE
    + """
    , sym AS (
        SELECT i AS id, j AS nbr, d FROM p
        UNION ALL
        SELECT j, i, d FROM p
    ), ranked AS (
        SELECT id, d, nbr,
               row_number() OVER (PARTITION BY id ORDER BY d, nbr) AS rn
        FROM sym
    )
    SELECT id, d AS core_dist FROM ranked WHERE rn = 5
    """
)


@register("core_distance_k5", oracle=_CORE_DIST_ORACLE)
def core_distance_k5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDBSCAN core distance (k=5): cosine distance to each vector's
    5th nearest neighbor — the per-point density scale hierarchical
    density clustering replaces DBSCAN's global eps with. Ties break
    on neighbor id so the answer is unique and cross-engine stable."""
    emb = read_table(spark, sf_dir, "embeddings")
    return core_distance(emb, id_col="vec_id", vec_col="embedding", k=5)

"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact; the oracle). Scale path:
random-hyperplane LSH bucketing (Charikar 2002) — sign-pattern
buckets shrink the candidate set from |corpus| to |bucket|, trading
recall for a ~2^planes fan-in reduction. Hyperplane weights are
derived deterministically from md5(plane|dim) so the oracle can
replay them (and so the "random" projection is reproducible across
runs and engines — a real pipeline would broadcast a seeded matrix).

Both paths are pure DataFrame ops: pairwise cosine is the native
zip_with/aggregate expression (functions.vectors), top-k is a
row_number window. No UDFs, no driver-side loops; the corpus side
of the join is hash-partitioned on the bucket key (LSH) or broadcast
(brute force with a small query set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine_similarity, l2_norm


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: cross join queries × corpus (queries side
    broadcast — the query set is small by construction), rank per
    query on rounded similarity with id tie-break.

    Output: ``query_id, neighbor_id, sim, rank``; self-matches
    excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    sim = F.round(
        cosine_similarity(
            F.col("__qv"),
            F.col("__cv"),
            a_norm=F.col("__qn"),
            b_norm=F.col("__cn"),
            assume_double=True,
        ),
        6,
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", sim)
        .select("query_id", "neighbor_id", "sim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: assign every corpus vector to its
    nearest centroid cell, probe the query's ``nprobe`` nearest cells,
    rank candidates only within them.

    ``centroids`` is any small DataFrame of (id, vector) — here a
    deterministic corpus subset so the oracle can replay it; a real
    pipeline would feed k-means centers. Physical shape per side:

    - corpus assignment: crossJoin(broadcast(centroids)) followed by a
      ``min(struct(-sim, cent_id, vec))`` aggregation — the argmin
      collapses map-side (partial agg), so the shuffle carries one row
      per corpus vector, never |corpus|×|centroids|. No window on the
      big side.
    - query probing: same broadcast cross join, row_number ≤ nprobe
      (the query set is small by construction).
    - candidate ranking: hash join probes ⋈ cells on cent_id — at
      100 TB cent_id is the bucketing/partition column, so a probe
      touches nprobe partitions instead of the full corpus.

    Each corpus vector lives in exactly one cell, so probing distinct
    cells never duplicates candidates. Ties break on rounded sim then
    id, identically in the oracle.
    """
    from pyspark.sql import Window

    cent = centroids.select(
        F.col(id_col).alias("cent_id"),
        as_double(F.col(vec_col)).alias("__ce"),
        l2_norm(F.col(vec_col)).alias("__cen"),
    )

    def _sim_to_centroid(vn_col: str) -> Column:
        return F.round(
            cosine_similarity(
                F.col("__v"),
                F.col("__ce"),
                a_norm=F.col(vn_col),
                b_norm=F.col("__cen"),
                assume_double=True,
            ),
            6,
        )

    corpus_pairs = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("__v"),
            l2_norm(F.col(vec_col)).alias("__vn"),
        )
        .crossJoin(F.broadcast(cent))
        .select(
            "neighbor_id",
            (-_sim_to_centroid("__vn")).alias("negsim"),
            "cent_id",
            F.col("__v").alias("cv"),
            F.col("__vn").alias("cn"),
        )
    )
    cells = corpus_pairs.groupBy("neighbor_id").agg(
        F.min(F.struct("negsim", "cent_id", "cv", "cn")).alias("s")
    ).select(
        "neighbor_id",
        F.col("s.cent_id").alias("cent_id"),
        F.col("s.cv").alias("__cv"),
        F.col("s.cn").alias("__cn"),
    )

    probe_w = Window.partitionBy("query_id").orderBy(
        F.asc("negsim"), F.asc("cent_id")
    )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("__v"),
            l2_norm(F.col(vec_col)).alias("__vn"),
        )
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            (-_sim_to_centroid("__vn")).alias("negsim"),
            "cent_id",
            F.col("__v").alias("__qv"),
            F.col("__vn").alias("__qn"),
        )
        .withColumn("__rn", F.row_number().over(probe_w))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "cent_id", "__qv", "__qn")
    )

    sim = F.round(
        cosine_similarity(
            F.col("__qv"),
            F.col("__cv"),
            a_norm=F.col("__qn"),
            b_norm=F.col("__cn"),
            assume_double=True,
        ),
        6,
    )
    pairs = (
        probes.join(cells, on="cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", sim)
        .select("query_id", "neighbor_id", "sim", "cent_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "sim",
            F.col("rank").cast("long").alias("rank"),
            F.col("cent_id").alias("cell"),
        )
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 2,
    round_decimals: int = 6,
) -> DataFrame:
    """Spherical k-means (Lloyd) refinement of an IVF centroid set —
    the "train the coarse quantizer" step a production ANN index runs
    before :func:`ivf_topk`, expressed entirely in DataFrame ops.

    Each iteration:

    1. assign every corpus vector to its max-cosine centroid — the
       same broadcast-crossJoin + ``min(struct(-sim, cent_id))``
       argmin as ivf_topk's cell assignment (partial-aggregated:
       the shuffle carries one row per vector);
    2. recompute each centroid as the element-wise mean of its
       members: posexplode to (cent, dim, x) rows and groupBy
       (cent, dim) — ``avg`` partial-aggregates map-side, so the
       shuffle carries |cells|×dim partials PER PARTITION, not
       |corpus|×dim rows; the means then fold back into an array
       ordered by dim. (Mean-of-members is the spherical-k-means
       centroid up to scale, and cosine assignment is
       scale-invariant, so normalization is unnecessary.)

    Empty cells keep their previous centroid (no dropped cells, cell
    ids stay stable). Mean components and similarities round to
    ``round_decimals`` — that makes every iteration's assignment an
    EXACT deterministic function replayable by the SQL oracle and
    identical across engines/partitionings, the same stabilization
    the other similarity operators use.

    Returns ``(id_col, vec_col)`` shaped exactly like the
    ``centroids`` input, ready to feed :func:`ivf_topk`.
    """
    cent = centroids.select(
        F.col(id_col).alias("cent_id"), as_double(F.col(vec_col)).alias("__ce")
    )
    base = corpus.select(
        F.col(id_col).alias("__vid"),
        as_double(F.col(vec_col)).alias("__v"),
        l2_norm(F.col(vec_col)).alias("__vn"),
    )
    for _ in range(iterations):
        c = cent.select(
            "cent_id",
            F.col("__ce"),
            l2_norm(F.col("__ce"), assume_double=True).alias("__cn"),
        )
        sim = F.round(
            cosine_similarity(
                F.col("__v"),
                F.col("__ce"),
                a_norm=F.col("__vn"),
                b_norm=F.col("__cn"),
                assume_double=True,
            ),
            round_decimals,
        )
        assigned = (
            base.crossJoin(F.broadcast(c))
            .select(
                "__vid",
                "__v",
                (-sim).alias("negsim"),
                "cent_id",
            )
            .groupBy("__vid")
            .agg(F.min(F.struct("negsim", "cent_id", F.col("__v").alias("v"))).alias("s"))
            .select(F.col("s.cent_id").alias("cent_id"), F.col("s.v").alias("__v"))
        )
        means = (
            assigned.select("cent_id", F.posexplode("__v").alias("dim", "x"))
            .groupBy("cent_id", "dim")
            .agg(F.round(F.avg("x"), round_decimals).alias("m"))
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s.m,
                ).alias("__new")
            )
        )
        cent = (
            cent.join(means, on="cent_id", how="left")
            .select(
                "cent_id", F.coalesce(F.col("__new"), F.col("__ce")).alias("__ce")
            )
        )
    return cent.select(
        F.col("cent_id").alias(id_col), F.col("__ce").alias(vec_col)
    )


def hyperplane_sign_bits(vec: Column, planes: int) -> Column:
    """Deterministic random-hyperplane signature: plane ``p`` weights
    dimension ``d`` by ±1 from the high bit of hex digit 1 of
    ``md5(p|d)``; the signature bit is the sign of the ±1-weighted
    sum. Returns the bucket id as a BIGINT in [0, 2^planes)."""
    dims = F.sequence(F.lit(1), F.size(vec))
    out = F.lit(0).cast("long")
    for p in range(planes):
        proj = F.aggregate(
            dims,
            F.lit(0.0),
            lambda acc, d: acc
            + F.element_at(vec, d).cast("double")
            * F.when(
                F.substring(
                    F.md5(F.concat(F.lit(f"{p}|"), d.cast("string"))), 1, 1
                ).isin("8", "9", "a", "b", "c", "d", "e", "f"),
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )
        out = out + (proj > 0).cast("long") * F.lit(1 << p)
    return out


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 4,
) -> DataFrame:
    """Approximate top-k: rank only within the query's sign bucket.

    At 100 TB the bucket column is what you'd write/bucket the corpus
    by, making each query a partition-pruned scan instead of a full
    pass. Recall loss is the standard LSH trade; raise ``planes``
    bands-style (multiple tables) for recall, not bucket width.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        hyperplane_sign_bits(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        hyperplane_sign_bits(F.col(vec_col), planes).alias("bucket"),
    )
    sim = F.round(
        cosine_similarity(
            F.col("__qv"),
            F.col("__cv"),
            a_norm=F.col("__qn"),
            b_norm=F.col("__cn"),
            assume_double=True,
        ),
        6,
    )
    pairs = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", sim)
        .select("bucket", "query_id", "neighbor_id", "sim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "sim",
            F.col("rank").cast("long").alias("rank"),
            "bucket",
        )
    )

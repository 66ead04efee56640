"""Scale stress: connected components on a ~10⁵-edge worst-case graph
(long chain = max diameter, star = max degree) must converge in
≲ log₂(n)+2 propagation rounds with no driver blow-up; the banded
merge path must spread a hot key (one group owning half the corpus)
across many (group, band) join keys instead of one task."""

from __future__ import annotations

import math
import time

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.merge import connected_components
from enclaveid_data_pipeline_spark.operators.similarity import (
    banded_pairwise_similarity,
    pairwise_similarity,
)

CHAIN_N = 60_000
STAR_N = 30_000
PAIRS_N = 5_000


def test_connected_components_1e5_edges_log_rounds(spark):
    # chain 0..60000 + star centered at 100000 + 5000 isolated pairs,
    # ~95k edges total, all built distributively (no driver lists)
    chain = spark.range(CHAIN_N).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    star = spark.range(STAR_N).select(
        F.lit(100_000).alias("src"), (F.col("id") + 100_001).alias("dst")
    )
    pairs = spark.range(PAIRS_N).select(
        (200_000 + 2 * F.col("id")).alias("src"),
        (200_001 + 2 * F.col("id")).alias("dst"),
    )
    edges = chain.union(star).union(pairs)

    stats: dict = {}
    t0 = time.time()
    cc = connected_components(edges, stats=stats)
    agg = (
        cc.select(
            F.when(F.col("node") <= CHAIN_N, "chain")
            .when(F.col("node") < 200_000, "star")
            .otherwise("pair")
            .alias("part"),
            "component",
            "node",
        )
        .groupBy("part")
        .agg(
            F.countDistinct("component").alias("n_comp"),
            F.count("node").alias("n_nodes"),
            F.min("component").alias("min_comp"),
            F.max("component").alias("max_comp"),
        )
    )
    res = {r.part: r for r in agg.collect()}
    elapsed = time.time() - t0

    assert res["chain"].n_comp == 1 and res["chain"].min_comp == 0
    assert res["chain"].n_nodes == CHAIN_N + 1
    assert res["star"].n_comp == 1 and res["star"].min_comp == 100_000
    assert res["pair"].n_comp == PAIRS_N  # each pair its own component
    assert res["pair"].max_comp == 200_000 + 2 * (PAIRS_N - 1)

    # convergence: diameter is the chain → rounds ≲ log2(n)+2
    bound = math.ceil(math.log2(CHAIN_N)) + 2
    assert stats["rounds"] <= bound, (stats, bound)
    assert elapsed < 60, f"CC stress took {elapsed:.1f}s"


def _hot_key_vectors(spark, n=20_000, hot_frac_mod=2):
    """n vectors; every ``hot_frac_mod``-th row lands in group -1 (the
    hot key owns ~1/hot_frac_mod of the corpus), the rest spread over
    100 groups."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % hot_frac_mod == 0, F.lit(-1))
        .otherwise((F.col("id") % 100).cast("long"))
        .alias("user_id"),
        F.array(
            (F.col("id") % 7).cast("double"),
            (F.col("id") % 11).cast("double"),
        ).alias("embedding"),
    )


def test_banded_path_spreads_hot_key(spark):
    """One group holding 50% of 20k vectors: the banded candidate
    space stays O(n·W) (vs ~50M all-pairs for the hot group alone)
    and the hot group's join keys spread over thousands of (group,
    band) buckets — the property that keeps one task from absorbing
    the whole group at 100 TB."""
    df = _hot_key_vectors(spark)
    t0 = time.time()
    banded = banded_pairwise_similarity(
        df, id_col="vec_id", vec_col="embedding",
        group_cols=("user_id",), band_width=4,
    )
    n_candidates = banded.count()
    elapsed = time.time() - t0
    assert n_candidates <= 20_000 * 4  # O(n·W), skew-independent
    assert elapsed < 60

    # the hot group's pairs ride ~n_hot/W distinct band keys
    hot = df.filter(F.col("user_id") == -1)
    n_hot_bands = (
        hot.select((F.col("vec_id") / 4).cast("long").alias("band"))
        .distinct()
        .count()
    )
    assert n_hot_bands >= 2_000  # 10k hot rows / band width 4

    # session defaults keep the AQE skew-join escape hatch on for the
    # residual-skew case banding doesn't cover (few giant groups
    # post-join)
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_banded_equals_allpairs_under_skew(spark):
    """Correctness under skew: banded candidates ≡ the theta-join
    definition restricted to the band width, on a smaller skewed
    fixture (all-pairs on the big one would be the very 50M-row plan
    banding exists to avoid)."""
    df = _hot_key_vectors(spark, n=2_000)
    banded = banded_pairwise_similarity(
        df, id_col="vec_id", vec_col="embedding",
        group_cols=("user_id",), band_width=4,
    ).select("user_id", "left_id", "right_id")
    theta = (
        pairwise_similarity(
            df, id_col="vec_id", vec_col="embedding", group_cols=("user_id",)
        )
        .filter(F.col("right_id") - F.col("left_id") <= 4)
        .select("user_id", "left_id", "right_id")
    )
    assert banded.exceptAll(theta).count() == 0
    assert theta.exceptAll(banded).count() == 0


def test_cdc_latest_snapshot_hotkey_windowgrouplimit(spark):
    """One key holds 50% of a 100k-row changelog: the newest-per-key
    reduction must plan a WindowGroupLimit (rank filter pushed to the
    partial level, so each map task forwards ~1 row per key it holds,
    not the hot key's 50k rows) and still answer exactly."""
    from enclaveid_data_pipeline_spark.operators.cdc import latest_snapshot

    n = 100_000
    df = spark.range(n).selectExpr(
        "id as seq",
        # even ids -> key 0 (the hot key); odd ids spread over 1..500
        "CASE WHEN id % 2 = 0 THEN 0 ELSE 1 + id % 500 END as k",
        "CASE WHEN id % 97 = 0 THEN 'D' ELSE 'U' END as op",
    )
    cur = latest_snapshot(df, ("k",), ("seq",), op_col="op")
    plan = cur._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan

    rows = {r.k: r.seq for r in cur.collect()}
    # hot key: newest even seq is 99998; 99998 % 97 != 0 -> present
    assert rows[0] == 99_998
    # every key's answer is the max seq of its rows (spot-check 3)
    for k in (2, 250, 500):
        seqs = [s for s in range(n) if s % 2 == 1 and 1 + s % 500 == k]
        top = max(seqs)
        if top % 97 == 0:
            assert k not in rows
        else:
            assert rows[k] == top


def _hot_label_embeddings(spark, n=6_000, dims=8):
    """~30% of ``n`` vectors land on label -1 (the hot user); vectors
    are hash-spread so hyperplane sign bits distribute uniformly."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 10 < 3, F.lit(-1))
        .otherwise((F.col("id") % 50).cast("long"))
        .alias("label"),
        F.array(
            *[
                (F.hash(F.col("id"), F.lit(d)) / 2_147_483_647.0).alias(
                    f"d{d}"
                )
                for d in range(dims)
            ]
        ).alias("embedding"),
    )


def test_ann_graph_twin_bounds_hot_user(spark):
    """One user owns 30% of a 6k-vector corpus. The exact top-1 graph
    puts that user's ~1.6M pairs on ONE task (group key = label); the
    ANN twin's (label, bucket) key must (a) spread the hot user over
    most of the 2^3 buckets, (b) cut candidate volume by ~bucket
    count, and (c) cap the largest single join group — the max-task
    input — well below the hot user's row count."""
    from enclaveid_data_pipeline_spark.operators.knn import (
        hyperplane_sign_bits,
    )

    df = _hot_label_embeddings(spark)
    n_hot = df.filter(F.col("label") == -1).count()
    assert n_hot >= 1_500  # fixture sanity: hot user really is hot

    b = df.withColumn(
        "bucket", hyperplane_sign_bits(F.col("embedding"), 3)
    )
    hot_buckets = (
        b.filter(F.col("label") == -1)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # (a) the hot user fans out over most buckets...
    assert len(hot_buckets) >= 6, hot_buckets
    # (c) ...and no single (label, bucket) join group keeps more than
    # ~1/3 of the hot user's rows (uniform would be 1/8)
    assert max(r["n"] for r in hot_buckets) <= 0.35 * n_hot, hot_buckets

    t0 = time.time()
    bucketed = pairwise_similarity(
        b, id_col="vec_id", vec_col="embedding",
        group_cols=("label", "bucket"),
    )
    n_bucketed = bucketed.count()
    elapsed = time.time() - t0
    # (b) candidate volume: exact all-pairs for the hot user alone is
    # n_hot*(n_hot-1)/2; the bucketed space must be at least 4x under
    # the full exact pair space (ideal is 8x with uniform buckets)
    exact_pairs_hot = n_hot * (n_hot - 1) // 2
    assert n_bucketed <= exact_pairs_hot / 2, (n_bucketed, exact_pairs_hot)
    assert elapsed < 60

    # graph contract survives bucketing: one edge per parent, ordered
    from enclaveid_data_pipeline_spark.operators.similarity import (
        top_k_neighbors,
    )

    top1 = top_k_neighbors(
        bucketed.withColumn("sim", F.round("similarity", 6)),
        k=1,
        group_cols=("label",),
        anchor_col="left_id",
        neighbor_col="right_id",
        sim_col="sim",
    )
    dup_parents = (
        top1.groupBy("label", "left_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert dup_parents == 0
    assert top1.filter(F.col("left_id") >= F.col("right_id")).count() == 0

"""DBSCAN + core-distance operator semantics on hand-built geometry.

The fixture is 2-D so every expected label is checkable by eye:
  blob A: 4 points within cosine distance ~0 of each other (core),
  blob B: 4 points near the orthogonal axis (core),
  a border point: eps-close to one A core but with too few
      neighbors to be core itself,
  an outlier: eps-close to nothing → noise.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.dbscan import (
    core_distance,
    dbscan,
    eps_neighbor_pairs,
)


def _vec(theta: float) -> list[float]:
    return [math.cos(theta), math.sin(theta)]


def _fixture(spark):
    # angles in radians; cosine distance = 1 - cos(dtheta)
    rows = [
        # blob A around theta=0 (pairwise dtheta <= 0.15 → dist <= 0.012)
        (0, _vec(0.00)),
        (1, _vec(0.05)),
        (2, _vec(0.10)),
        (3, _vec(0.15)),
        # blob B around theta=pi/2
        (10, _vec(1.50)),
        (11, _vec(1.55)),
        (12, _vec(1.60)),
        (13, _vec(1.65)),
        # border: 0.45 rad (dist to id 3 = 1-cos(0.30) ≈ 0.0447,
        # within eps; dist to id 2 = 1-cos(0.35) ≈ 0.0606, outside)
        # → exactly one eps-neighbor → not core, attaches to A
        (20, _vec(0.45)),
        # outlier: far from everything
        (30, _vec(3.00)),
    ]
    return spark.createDataFrame(rows, "id long, embedding array<double>")


EPS = 0.05
MIN_PTS = 3


def test_dbscan_labels_roles(spark):
    df = _fixture(spark)
    out = dbscan(
        df, id_col="id", vec_col="embedding", eps=EPS, min_pts=MIN_PTS
    )
    got = {r["id"]: (r["cluster"], r["role"]) for r in out.collect()}
    assert len(got) == 10
    # blob A: all core, cluster = min member id = 0
    for i in (0, 1, 2, 3):
        assert got[i] == (0, "core"), (i, got[i])
    # blob B: all core, cluster = 10
    for i in (10, 11, 12, 13):
        assert got[i] == (10, "core"), (i, got[i])
    # border attaches to A's cluster
    assert got[20] == (0, "border")
    # outlier is noise
    assert got[30] == (-1, "noise")


def test_dbscan_isolated_core_is_singleton_cluster(spark):
    # 3 mutually-close points, min_pts=3: every one is core, but the
    # component has edges so the cluster is the min id; then a lone
    # dense pair that is NOT core (min_pts=3) → both noise.
    rows = [
        (5, _vec(0.00)),
        (6, _vec(0.02)),
        (7, _vec(0.04)),
        (40, _vec(2.00)),
        (41, _vec(2.02)),
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan(
            df, id_col="id", vec_col="embedding", eps=EPS, min_pts=3
        ).collect()
    }
    assert got[5] == (5, "core")
    assert got[6] == (5, "core")
    assert got[7] == (5, "core")
    # the pair: 1 neighbor each + self = 2 < 3 → noise (no core near)
    assert got[40] == (-1, "noise")
    assert got[41] == (-1, "noise")


def test_border_takes_min_cluster_when_between_two(spark):
    # border point eps-close to exactly one core of each of TWO
    # clusters → deterministic min cluster id wins. min_pts=4 so the
    # 2-neighbor bridge can't itself be core (which would merge the
    # blobs).
    rows = [
        (0, _vec(0.00)),
        (1, _vec(0.01)),
        (2, _vec(0.02)),
        (3, _vec(0.03)),
        (10, _vec(0.65)),
        (11, _vec(0.66)),
        (12, _vec(0.67)),
        (13, _vec(0.68)),
        # bridge at 0.34: dθ=0.31 to ids 3 and 10 (dist≈0.0477 ≤ eps);
        # dθ=0.32 to ids 2 and 11 (dist≈0.0508 > eps) → exactly 2 nbrs
        (5, _vec(0.34)),
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan(
            df, id_col="id", vec_col="embedding", eps=0.05, min_pts=4
        ).collect()
    }
    assert got[3] == (0, "core") and got[10] == (10, "core")
    assert got[5] == (0, "border")  # min(0, 10)


def test_core_distance_matches_brute(spark):
    df = _fixture(spark)
    out = {
        r["id"]: r["core_dist"]
        for r in core_distance(
            df, id_col="id", vec_col="embedding", k=3
        ).collect()
    }
    # id 0's 3 nearest: ids 1,2,3 at dist 1-cos(0.05/0.10/0.15);
    # k=3 → 1-cos(0.15)
    assert abs(out[0] - round(1 - math.cos(0.15), 6)) < 1e-9
    # every point has 9 others, so all 10 rows present
    assert len(out) == 10


def test_candidate_pairs_injection_equivalent(spark):
    # the banded/LSH scale path: dbscan(candidate_pairs=...) must
    # reproduce the all-pairs labeling when given the full eps-pairs
    df = _fixture(spark)
    pairs = eps_neighbor_pairs(df, "id", "embedding", EPS)
    a = dbscan(
        df, id_col="id", vec_col="embedding", eps=EPS, min_pts=MIN_PTS
    )
    b = dbscan(
        df,
        id_col="id",
        vec_col="embedding",
        eps=EPS,
        min_pts=MIN_PTS,
        candidate_pairs=pairs,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_plan_has_no_cartesian_or_python(spark):
    df = _fixture(spark)
    plan = dbscan(
        df, id_col="id", vec_col="embedding", eps=EPS, min_pts=MIN_PTS
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_core_distance_precomputed_half_pairs_equivalent(spark):
    # the shared-truth-table path (queries.dbscan_queries
    # _half_pairs_shared): core_distance given the unfiltered
    # ordered pair table must reproduce the in-function all-pairs
    from enclaveid_data_pipeline_spark.operators.dbscan import _all_pairs

    df = _fixture(spark)
    half = (
        _all_pairs(df, "id", "embedding")
        .withColumn("dist", F.round(F.lit(1.0) - F.col("similarity"), 6))
        .select("left_id", "right_id", "dist")
    )
    a = core_distance(df, id_col="id", vec_col="embedding", k=3)
    b = core_distance(
        df, id_col="id", vec_col="embedding", k=3, half_pairs=half
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

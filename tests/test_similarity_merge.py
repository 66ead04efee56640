from __future__ import annotations

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.merge import (
    connected_components,
    merge_components,
)
from enclaveid_data_pipeline_spark.operators.similarity import (
    lag_similarity,
    pairwise_similarity,
    top_k_neighbors,
)


def _emb_df(spark):
    # Two groups; group 1 has an obvious duplicate pair (1,2).
    return spark.createDataFrame(
        [
            (1, 1, [1.0, 0.0]),
            (1, 2, [1.0, 0.0]),
            (1, 3, [0.0, 1.0]),
            (2, 4, [1.0, 1.0]),
            (2, 5, [-1.0, 1.0]),
        ],
        "g int, id long, v array<double>",
    )


def test_lag_similarity_null_first(spark):
    out = lag_similarity(
        _emb_df(spark), vec_col="v", group_cols=("g",), order_cols=("id",)
    ).collect()
    by_id = {r.id: r.cosine_similarity for r in out}
    assert by_id[1] is None and by_id[4] is None
    assert abs(by_id[2] - 1.0) < 1e-12
    assert abs(by_id[3]) < 1e-12
    assert abs(by_id[5]) < 1e-12


def test_pairwise_similarity_ordered(spark):
    pairs = pairwise_similarity(
        _emb_df(spark), id_col="id", vec_col="v", group_cols=("g",)
    ).collect()
    keys = {(r.g, r.left_id, r.right_id) for r in pairs}
    # within-group ordered pairs only
    assert keys == {(1, 1, 2), (1, 1, 3), (1, 2, 3), (2, 4, 5)}
    sim = {(r.left_id, r.right_id): r.similarity for r in pairs}
    assert abs(sim[(1, 2)] - 1.0) < 1e-12
    assert abs(sim[(1, 3)]) < 1e-12


def test_top_k_neighbors_tiebreak(spark):
    pairs = pairwise_similarity(
        _emb_df(spark), id_col="id", vec_col="v", group_cols=("g",)
    )
    top1 = top_k_neighbors(
        pairs, k=1, group_cols=("g",), rank_sim=F.round("similarity", 6)
    ).collect()
    best = {(r.g, r.left_id): r.right_id for r in top1}
    assert best[(1, 1)] == 2  # exact duplicate wins
    assert best[(2, 4)] == 5  # only candidate


def test_connected_components_chain_and_star(spark):
    # chain 1-2-3-4 and star 10-(11,12); singleton 20 not in edges
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12)], "src long, dst long"
    )
    cc = {r.node: r.component for r in connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_connected_components_order_independent(spark):
    e1 = spark.createDataFrame([(3, 4), (1, 2), (2, 3)], "src long, dst long")
    e2 = spark.createDataFrame([(4, 3), (2, 1), (3, 2)], "src long, dst long")
    c1 = {r.node: r.component for r in connected_components(e1).collect()}
    c2 = {r.node: r.component for r in connected_components(e2).collect()}
    assert c1 == c2 == {1: 1, 2: 1, 3: 1, 4: 1}


def test_merge_components_spans(spark):
    rows = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 15.0, 30.0), (5, 100.0, 110.0)],
        "id long, start double, end double",
    )
    comps = spark.createDataFrame([(1, 1), (2, 1)], "node long, component long")
    merged = merge_components(
        rows,
        comps,
        id_col="id",
        agg_exprs={
            "start": F.min("start"),
            "end": F.max("end"),
            "n": F.count(F.lit(1)),
        },
    ).collect()
    by_comp = {r.component: (r.start, r.end, r.n) for r in merged}
    # merged span covers both inputs (property: span covers inputs)
    assert by_comp[1] == (10.0, 30.0, 2)
    # row without an edge stays a singleton component
    assert by_comp[5] == (100.0, 110.0, 1)

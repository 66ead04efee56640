"""Fixed-point PageRank: structure ordering, mass conservation up to
deterministic rounding loss, dangling redistribution."""

from __future__ import annotations

from enclaveid_data_pipeline_spark.operators.graph import SCALE, pagerank_fixed


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank_s for r in pagerank_fixed(df, **kw).collect()}


def test_star_hub_dominates_and_mass_conserved(spark):
    # undirected star: hub h ↔ 4 leaves
    edges = []
    for leaf in "abcd":
        edges += [("h", leaf), (leaf, "h")]
    got = _ranks(spark, edges, iterations=5)
    assert got["h"] == max(got.values())
    assert all(got["h"] > got[leaf] for leaf in "abcd")
    # integer div loses < 1 unit per div; a handful of divs per round
    total = sum(got.values())
    assert SCALE - 5 * 20 <= total <= SCALE


def test_dangling_mass_redistributes(spark):
    # b has no out-edges: its rank must not vanish from the system
    got = _ranks(spark, [("a", "b"), ("c", "b")], iterations=4)
    total = sum(got.values())
    assert total >= SCALE - 100
    assert got["b"] == max(got.values())  # sink collects, then reflows


def test_deterministic_across_partitionings(spark):
    edges = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(100)]
    a = _ranks(spark, edges, iterations=3)
    df = spark.createDataFrame(edges, "src string, dst string").repartition(13)
    b = {r.node: r.rank_s for r in pagerank_fixed(df, iterations=3).collect()}
    assert a == b  # bit-identical under a different partitioning


def test_count_triangles_known_graphs(spark):
    """K4 (4 triangles) + a star (0 — wedges galore, no closures) +
    a triangle reported with mixed edge directions and duplicates:
    orientation, dedup and closure are all exercised."""
    from enclaveid_data_pipeline_spark.operators.graph import count_triangles

    k4 = [(1, a, b) for a in range(4) for b in range(a + 1, 4)]
    star = [(2, 0, i) for i in range(1, 30)]
    messy_triangle = [(3, 10, 11), (3, 12, 10), (3, 11, 12), (3, 11, 10)]
    self_loop = [(3, 10, 10)]
    df = spark.createDataFrame(
        k4 + star + messy_triangle + self_loop,
        "g long, src long, dst long",
    )
    rows = {
        r.g: r.n_triangles
        for r in count_triangles(df, group_cols=("g",)).collect()
    }
    assert rows == {1: 4, 3: 1}  # star absent: zero triangles


def test_count_triangles_ungrouped_scalar(spark):
    from enclaveid_data_pipeline_spark.operators.graph import count_triangles

    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
    )
    assert count_triangles(df).collect()[0].n_triangles == 1

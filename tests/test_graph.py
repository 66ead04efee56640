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

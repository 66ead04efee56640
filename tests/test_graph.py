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


def test_bfs_levels_path_graph(spark):
    """Path 0-1-2-3-4-5 (symmetrized), seed 0, max_hops 3: hops are
    exact shortest distances and the cutoff drops nodes 4,5."""
    from enclaveid_data_pipeline_spark.operators.graph import bfs_levels

    path = [(i, i + 1) for i in range(5)]
    edges = spark.createDataFrame(
        path + [(b, a) for a, b in path], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r.node: r.hop for r in bfs_levels(edges, seeds, max_hops=3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_levels_multi_seed_early_exit(spark):
    """Two seeds on a 4-cycle: everything is within 1 hop; the
    frontier empties before max_hops and the loop exits early."""
    from enclaveid_data_pipeline_spark.operators.graph import bfs_levels

    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    edges = spark.createDataFrame(
        cyc + [(b, a) for a, b in cyc], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (2,)], "node long")
    got = {
        r.node: r.hop for r in bfs_levels(edges, seeds, max_hops=10).collect()
    }
    assert got == {0: 0, 2: 0, 1: 1, 3: 1}


def test_label_propagation_separate_cliques(spark):
    """Two disconnected triangles: each converges to its min member
    id — no cross-talk, deterministic."""
    from enclaveid_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    t1 = [(0, 1), (1, 2), (2, 0)]
    t2 = [(10, 11), (11, 12), (12, 10)]
    und = t1 + t2
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {
        r.node: r.label
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert {got[0], got[1], got[2]} == {0}
    assert {got[10], got[11], got[12]} == {10}


def test_label_propagation_bridge_fixpoint_traced(spark):
    """Two triangles + one bridge (2–10): the min tie-break lets the
    bridge leak clique A's small ids into clique B — the hand-traced
    3-round fixpoint is clique A all 0 and clique B all 2. Pins the
    exact synchronous-update semantics the SQL oracle replays (and
    documents the known min-tie-break bleed on tiny graphs)."""
    from enclaveid_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    t1 = [(0, 1), (1, 2), (2, 0)]
    t2 = [(10, 11), (11, 12), (12, 10)]
    bridge = [(2, 10)]
    und = t1 + t2 + bridge
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {
        r.node: r.label
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert {got[0], got[1], got[2]} == {0}
    assert {got[10], got[11], got[12]} == {2}


def test_label_propagation_round_count_changes_result(spark):
    """On a path graph labels keep flowing inward round by round —
    pins that rounds are synchronous (1 round != 2 rounds)."""
    from enclaveid_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    path = [(i, i + 1) for i in range(4)]
    edges = spark.createDataFrame(
        path + [(b, a) for a, b in path], "src long, dst long"
    )
    one = {
        r.node: r.label
        for r in label_propagation(edges, iterations=1).collect()
    }
    two = {
        r.node: r.label
        for r in label_propagation(edges, iterations=2).collect()
    }
    # after 1 round node 2 sees {1,3} -> min tie-break = 1;
    # after 2 rounds its neighbors both voted 0 and 2 -> label 0 wins
    assert one[2] == 1
    assert two[2] != one[2]


def test_deterministic_random_walks_tiny_graph(spark):
    """Triangle a-b-c (symmetrized): every walk has walk_len+1 nodes,
    each step moves along a real edge, and two runs are identical."""
    import hashlib

    from enclaveid_data_pipeline_spark.operators.graph import (
        deterministic_random_walks,
    )

    und = [("a", "b"), ("b", "c"), ("c", "a")]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src string, dst string"
    )
    out1 = {r.start: r.walk for r in
            deterministic_random_walks(edges, walk_len=3).collect()}
    out2 = {r.start: r.walk for r in
            deterministic_random_walks(edges, walk_len=3).collect()}
    assert out1 == out2
    nbr = {"a": ["b", "c"], "b": ["a", "c"], "c": ["a", "b"]}
    for start, walk in out1.items():
        nodes = walk.split(" ")
        assert len(nodes) == 4 and nodes[0] == start
        cur = start
        for step, nxt in enumerate(nodes[1:]):
            assert nxt in nbr[cur]
            # replay the md5 index choice
            h = hashlib.md5(f"{start}|{step}|{cur}".encode()).hexdigest()
            assert nxt == nbr[cur][int(h[:8], 16) % len(nbr[cur])]
            cur = nxt


def test_deterministic_random_walks_sink_truncation(spark):
    """Directed chain a→b→c with sink c (ADVICE r3): every node of
    src ∪ dst gets exactly one walk, and a walk reaching the sink is
    emitted TRUNCATED (not dropped) — pre-fix the inner join dropped
    any walk touching an out-degree-0 node and sink-only nodes never
    started one."""
    from enclaveid_data_pipeline_spark.operators.graph import (
        deterministic_random_walks,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    out = {r.start: r.walk for r in
           deterministic_random_walks(edges, walk_len=3).collect()}
    # single out-neighbors make every hop deterministic regardless
    # of the md5 index (mod 1)
    assert out == {"a": "a b c", "b": "b c", "c": "c"}


def test_personalized_pagerank_proximity_ordering(spark):
    """Triangle a-b-c with pendant chain c-d-e (symmetrized), seed a.
    The odd cycle mixes (a pure path/bipartite graph oscillates by
    distance parity at small fixed iteration counts — observed, not
    a bug: the oracle replays the same transient), so the converged
    ordering shows: seed dominates, the far pendant gets least, and
    mass is conserved up to integer-div loss."""
    from enclaveid_data_pipeline_spark.operators.graph import (
        personalized_pagerank_fixed,
    )

    und = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        r.node: r.rank_s
        for r in personalized_pagerank_fixed(
            edges, seeds, iterations=6
        ).collect()
    }
    assert got["a"] == max(got.values())
    assert got["e"] == min(got.values())
    assert got["e"] < got["a"] // 4
    assert sum(got.values()) <= SCALE
    assert sum(got.values()) >= SCALE - 1000


def test_mode_none_edge_caches_are_ring_bounded(spark):
    """r4 ADVICE: materialize_mode='none' persisted the edge table
    for the session's lifetime, unboundedly. The bounded FIFO ring
    caps total pinned caches at _RING_CAP and keeps the NEWEST
    caches hot (a GC hook fires too early in composed queries — the
    r5 lesson; plain-persist eviction only ever costs recompute)."""
    from enclaveid_data_pipeline_spark.operators import graph as G

    cm = spark._jsparkSession.sharedState().cacheManager()
    cm.clearCache()
    G._EDGE_CACHE_RING.clear()
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    outs = []
    for _ in range(G._RING_CAP + 2):
        out = pagerank_fixed(edges, iterations=3, materialize_mode="none")
        assert len(out.collect()) == 3  # consume while newest: cache hot
        outs.append(out)
    assert len(G._EDGE_CACHE_RING) == G._RING_CAP
    # evicted caches recompute, never fail: the OLDEST result still reads
    assert len(outs[0].collect()) == 3
    G._EDGE_CACHE_RING.clear()


def test_walks_register_neighbor_cache_in_ring(spark):
    """deterministic_random_walks never unpersisted at all (r4
    ADVICE); its neighbor-list cache now rides the same bounded
    ring."""
    from enclaveid_data_pipeline_spark.operators import graph as G
    from enclaveid_data_pipeline_spark.operators.graph import (
        deterministic_random_walks,
    )

    G._EDGE_CACHE_RING.clear()
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    out = deterministic_random_walks(edges, walk_len=2)
    assert out.count() == 2
    assert len(G._EDGE_CACHE_RING) == 1
    G._EDGE_CACHE_RING.clear()


def test_kcore_peel_cascade_and_convergence(spark):
    from enclaveid_data_pipeline_spark.operators.graph import kcore_peel

    # path a-b-c-d plus a triangle x-y-z: 2-core = the triangle only,
    # but the path peels one endpoint pair per round (a,d first, then
    # b,c) — a genuine cascade needing 2 rounds
    und = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "z"), ("x", "z")]
    edges = spark.createDataFrame(
        und + [(t, s) for s, t in und], "src string, dst string"
    )
    done = kcore_peel(edges, k=2, rounds=2)
    rows = {r.node: (r.deg, r.converged) for r in done.collect()}
    assert set(rows) == {"x", "y", "z"}
    assert all(v == (2, True) for v in rows.values())

    # one round is NOT enough: b,c survive round 1 (degree 2 before
    # a,d vanish) but the flag self-certifies non-convergence
    partial = kcore_peel(edges, k=2, rounds=1)
    rows1 = {r.node: (r.deg, r.converged) for r in partial.collect()}
    assert set(rows1) == {"b", "c", "x", "y", "z"}
    assert rows1["b"] == (1, False)

    # peel-to-empty: converged (vacuously) with zero rows
    empty = kcore_peel(edges, k=4, rounds=2)
    assert empty.count() == 0


def test_local_clustering_clique_vs_chain(spark):
    from enclaveid_data_pipeline_spark.operators.graph import (
        local_clustering,
    )

    # triangle a-b-c (every node lcc=1) + chain c-d-e (d: lcc=0)
    und = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(
        und + [(t, s) for s, t in und], "src string, dst string"
    )
    rows = {
        r.node: (r.deg, r.n_tri, round(r.lcc, 4))
        for r in local_clustering(edges).collect()
    }
    assert rows["a"] == (2, 1, 1.0)
    assert rows["b"] == (2, 1, 1.0)
    # c has deg 3, one triangle among its 3 neighbor pairs → 1/3
    assert rows["c"] == (3, 1, round(2 / 6, 4))
    assert rows["d"] == (2, 0, 0.0)
    assert "e" not in rows  # deg 1 filtered (coefficient undefined)

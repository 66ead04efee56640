"""Property tests for the connected-components merge rewrite
(SURVEY §5.2.4, §7.3 hard part 2).

The reference's iterative UPDATE/DELETE loop is order-dependent (its
own TODO, reference assets/recent_history.py:375-383); our set-based
rewrite must be provably order-independent, transitive-complete, and
idempotent. Hypothesis drives random edge sets; the ground truth is a
30-line union-find executed driver-side.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.merge import (
    connected_components,
    merge_components,
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: every node -> min id of its component
    return {n: find(n) for n in parent}


_edge = st.tuples(
    st.integers(min_value=0, max_value=24), st.integers(min_value=0, max_value=24)
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=st.lists(_edge, min_size=1, max_size=30))
def test_components_match_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=st.lists(_edge, min_size=2, max_size=20))
def test_components_order_and_direction_independent(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    fwd = spark.createDataFrame(edges, ["src", "dst"])
    rev = spark.createDataFrame(
        [(b, a) for a, b in reversed(edges)], ["src", "dst"]
    )
    lf = {r.node: r.component for r in connected_components(fwd).collect()}
    lr = {r.node: r.component for r in connected_components(rev).collect()}
    assert lf == lr


def test_merge_spans_cover_inputs_and_idempotent(spark):
    rows = spark.createDataFrame(
        [(1, 10, 20), (2, 15, 30), (3, 40, 50), (4, 5, 12), (9, 70, 80)],
        ["id", "t_start", "t_end"],
    )
    edges = spark.createDataFrame([(1, 2), (2, 4)], ["src", "dst"])
    comps = connected_components(edges)
    merged = merge_components(
        rows,
        comps,
        id_col="id",
        agg_exprs={
            "t_start": F.min("t_start"),
            "t_end": F.max("t_end"),
            "n": F.count(F.lit(1)),
        },
    )
    out = {r.component: r for r in merged.collect()}
    # component 1 = {1,2,4}: span covers all members
    assert out[1].t_start == 5 and out[1].t_end == 30 and out[1].n == 3
    # untouched rows remain singleton components
    assert out[3].n == 1 and out[9].n == 1
    # idempotence: merging the merged output with no edges is identity
    again = merge_components(
        merged.select(F.col("component").alias("id"), "t_start", "t_end"),
        connected_components(
            spark.createDataFrame([], "src INT, dst INT")
        ),
        id_col="id",
        agg_exprs={"t_start": F.min("t_start"), "t_end": F.max("t_end")},
    )
    assert {
        (r.component, r.t_start, r.t_end) for r in again.collect()
    } == {(r.component, r.t_start, r.t_end) for r in merged.collect()}

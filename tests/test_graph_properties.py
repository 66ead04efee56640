"""Property test: kcore_peel equals a pure-python peeling model on
random graphs — fixed-round semantics, degree values, and the
converged flag all match for every (k, rounds) the strategy draws."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from enclaveid_data_pipeline_spark.operators.graph import kcore_peel

_SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# undirected edges over a small node universe; self-loops excluded
_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=0,
    max_size=30,
    unique=True,
)


def _model_peel(und: set[tuple[int, int]], k: int, rounds: int):
    """Dict peeling over the symmetrized edge set, one synchronized
    round at a time (all below-k nodes drop together)."""
    edges = {(a, b) for a, b in und} | {(b, a) for a, b in und}
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for a, _b in edges:
            deg[a] = deg.get(a, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    deg = {}
    for a, _b in edges:
        deg[a] = deg.get(a, 0) + 1
    converged = all(d >= k for d in deg.values())
    return deg, converged


@_SLOW
@given(raw=_edges, k=st.integers(1, 4), rounds=st.integers(1, 3))
def test_kcore_matches_model(spark, raw, k, rounds):
    # dedupe the undirected pair set (1,2)/(2,1) before symmetrizing
    und = {tuple(sorted(e)) for e in raw}
    if not und:
        return
    sym = list(und) + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src long, dst long")
    got = kcore_peel(edges, k=k, rounds=rounds)
    rows = {r.node: (r.deg, r.converged) for r in got.collect()}
    want_deg, want_conv = _model_peel(und, k, rounds)
    assert {n: d for n, (d, _c) in rows.items()} == want_deg
    for _n, (_d, c) in rows.items():
        assert c == want_conv

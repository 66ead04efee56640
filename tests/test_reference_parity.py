"""Property tests: the distributed operators against independent
pure-Python reference implementations on randomized inputs
(hypothesis). These catch semantic drift the example-based tests
can't: any counterexample shrinks to a minimal corpus/point set.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from enclaveid_data_pipeline_spark.operators.dbscan import dbscan
from enclaveid_data_pipeline_spark.operators.trainprep import (
    remove_duplicated_spans,
)


# ---------- span removal ----------

def _py_span_removal(docs, n=3, min_docs=2):
    toks = {i: t.split(" ") for i, t in docs}
    grams = {}
    for i, ts in toks.items():
        for p in range(len(ts) - n + 1):
            grams.setdefault(" ".join(ts[p : p + n]), set()).add(i)
    shared = {g for g, ds in grams.items() if len(ds) >= min_docs}
    out = {}
    for i, ts in toks.items():
        cov = set()
        for p in range(len(ts) - n + 1):
            if " ".join(ts[p : p + n]) in shared:
                cov.update(range(p, p + n))
        kept = [t for p, t in enumerate(ts) if p not in cov]
        out[i] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("a b c d e".split()), min_size=1, max_size=12
        ),
        min_size=2,
        max_size=6,
    )
)
def test_span_removal_matches_python_reference(spark, corpora):
    docs = [(i, " ".join(ts)) for i, ts in enumerate(corpora)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in remove_duplicated_spans(
            df, id_col="doc_id", text_col="text", n=3, min_docs=2
        ).collect()
    }
    assert got == _py_span_removal(docs)


# ---------- DBSCAN ----------

def _py_dbscan(points, eps, min_pts):
    ids = sorted(points)

    def dist(a, b):
        (xa, ya), (xb, yb) = points[a], points[b]
        na = math.hypot(xa, ya) or 1.0
        nb = math.hypot(xb, yb) or 1.0
        return round(1 - (xa * xb + ya * yb) / (na * nb), 6)

    nbrs = {
        i: [j for j in ids if j != i and dist(i, j) <= eps] for i in ids
    }
    core = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    # components over core-core edges: min core id per component
    label = {i: i for i in core}

    def find(x):
        while label[x] != x:
            label[x] = label[label[x]]
            x = label[x]
        return x

    for i in core:
        for j in nbrs[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    label[max(a, b)] = min(a, b)
    out = {}
    for i in ids:
        if i in core:
            out[i] = (find(i), "core")
        else:
            cand = [find(j) for j in nbrs[i] if j in core]
            out[i] = (min(cand), "border") if cand else (-1, "noise")
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-1, 1, allow_nan=False, width=32),
            st.floats(-1, 1, allow_nan=False, width=32),
        ).filter(lambda p: abs(p[0]) + abs(p[1]) > 1e-3),
        min_size=3,
        max_size=12,
        unique=True,
    )
)
def test_dbscan_matches_python_reference(spark, pts):
    points = {i: p for i, p in enumerate(pts)}
    df = spark.createDataFrame(
        [(i, [float(x), float(y)]) for i, (x, y) in points.items()],
        "id long, embedding array<double>",
    )
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan(
            df, id_col="id", vec_col="embedding", eps=0.05, min_pts=3
        ).collect()
    }
    assert got == _py_dbscan(points, eps=0.05, min_pts=3)

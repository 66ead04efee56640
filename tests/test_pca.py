"""PCA operator: recover a planted dominant direction."""

from __future__ import annotations

import math

from enclaveid_data_pipeline_spark.operators.pca import pca_top_component


def test_pca_recovers_planted_direction(spark):
    """Points spread along u = (3,4)/5 with small orthogonal noise:
    the top component must align with u (|cos| > 0.99) and be
    unit-norm; sign fixed so the first loading is positive."""
    u = (0.6, 0.8)
    o = (-0.8, 0.6)
    rows = []
    for k in range(40):
        t = (k - 20) / 4.0            # dominant spread
        s = ((k * 7) % 5 - 2) / 50.0  # deterministic small noise
        rows.append((k, [u[0] * t + o[0] * s, u[1] * t + o[1] * s]))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    got = {
        r["pos"]: r["loading"]
        for r in pca_top_component(df, vec_col="embedding", dims=2).collect()
    }
    v = (got[0], got[1])
    nrm = math.hypot(*v)
    assert abs(nrm - 1.0) < 1e-3
    cos = (v[0] * u[0] + v[1] * u[1]) / nrm
    assert abs(cos) > 0.99
    assert v[0] > 0  # sign fix: first nonzero loading positive


def test_pca_dims_probe_default(spark):
    rows = [(k, [float(k % 3), float(k % 5), 0.0]) for k in range(30)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    out = pca_top_component(df, vec_col="embedding")
    assert out.count() == 3


def test_top2_projection_recovers_plane(spark):
    """3-D points spread in the xy-ish plane spanned by two known
    orthogonal directions with tiny z noise: the 2-D projection must
    preserve pairwise distances of the planar coordinates (rotation/
    reflection-invariant check), and the z noise must not leak."""
    import math

    from enclaveid_data_pipeline_spark.operators.pca import (
        top2_projection,
    )

    u = (0.6, 0.8, 0.0)
    w = (-0.8, 0.6, 0.0)
    rows = []
    coords = {}
    for k in range(30):
        a = (k - 15) / 3.0
        b = ((k * 7) % 11 - 5) / 4.0
        z = ((k * 3) % 5 - 2) / 100.0
        rows.append(
            (
                k,
                [
                    u[0] * a + w[0] * b,
                    u[1] * a + w[1] * b,
                    z,
                ],
            )
        )
        coords[k] = (a, b)
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    got = {
        r["id"]: (r["px"], r["py"])
        for r in top2_projection(
            df, id_col="id", vec_col="embedding", dims=3
        ).collect()
    }
    assert len(got) == 30

    def d2(p, q):
        return math.hypot(p[0] - q[0], p[1] - q[1])

    # distances in the recovered layout match planar distances
    # (centering shifts coords but preserves differences)
    for a, b in [(0, 29), (5, 20), (3, 17)]:
        want = d2(coords[a], coords[b])
        have = d2(got[a], got[b])
        assert abs(want - have) < 0.05, (a, b, want, have)


def test_pca_agrees_with_numpy_eig(spark):
    """Random-ish 6-D data with a planted dominant direction: the
    fixed-point 3-round loading vector must align (|cos| > 0.995)
    with numpy's exact top eigenvector of the same covariance."""
    import numpy as np

    rng = np.random.RandomState(7)
    u = rng.randn(6)
    u /= np.linalg.norm(u)
    data = rng.randn(80, 6) * 0.3 + np.outer(rng.randn(80) * 3.0, u)
    rows = [(i, [float(x) for x in data[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    got = {
        r["pos"]: r["loading"]
        for r in pca_top_component(df, vec_col="embedding", dims=6).collect()
    }
    v = np.array([got[i] for i in range(6)])
    c = np.cov(np.round(data, 6).T, bias=True)
    w, vecs = np.linalg.eigh(c)
    top = vecs[:, np.argmax(w)]
    cos = abs(float(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert cos > 0.995, cos

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


def test_mv_shift_dims_derivation():
    """ADVICE r3: the matvec downshift is dims-derived — historical
    10^7 for dims <= 64 (oracle-pinned), stepping up ~dims^1.5 in
    powers of 10 so the integer norm-squared cannot wrap for wide
    sentence-embedding dims (384/768)."""
    from enclaveid_data_pipeline_spark.operators.pca import _mv_shift

    assert _mv_shift(8) == 10_000_000
    assert _mv_shift(64) == 10_000_000
    assert _mv_shift(128) == 10 ** 8
    assert _mv_shift(384) == 10 ** 9
    assert _mv_shift(768) == 10 ** 9
    for d in (128, 384, 768, 2048):
        shift = _mv_shift(d)
        mv_s = d * 250_000 * 100_000_000 // shift
        assert d * mv_s * mv_s < 2 ** 62


def test_wide_vectors_power_iteration_no_wrap(spark):
    """384-dim planted-direction corpus: the dims-derived shift keeps
    every intermediate inside BIGINT and the dominant component is
    still recovered (pre-fix the norm-squared wrapped silently)."""
    import numpy as np

    from enclaveid_data_pipeline_spark.operators.pca import (
        pca_top_component,
    )

    rng = np.random.default_rng(7)
    d = 384
    direction = np.zeros(d)
    direction[5] = 1.0
    rows = []
    for i in range(60):
        v = 0.9 * ((-1) ** i) * direction + 0.02 * rng.standard_normal(d)
        rows.append(([float(x) for x in v],))
    df = spark.createDataFrame(rows, "embedding array<double>")
    out = {r["pos"]: r["loading"] for r in pca_top_component(df).collect()}
    top = max(out, key=lambda p: abs(out[p]))
    assert top == 5
    assert abs(out[5]) > 0.95

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

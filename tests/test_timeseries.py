from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.timeseries import (
    interpolate_linear,
    interpolate_linear_fixedpoint,
    locf,
)


@pytest.fixture(scope="module")
def grid(spark):
    # user 1: obs at t=0 (10.0) and t=4 (30.0), gaps between;
    # user 2: single obs at t=2 — no interior gap, edges stay null
    rows = [
        (1, 0, 10.0),
        (1, 1, None),
        (1, 2, None),
        (1, 3, None),
        (1, 4, 30.0),
        (1, 5, None),
        (2, 0, None),
        (2, 1, None),
        (2, 2, 7.5),
        (2, 3, None),
    ]
    return spark.createDataFrame(rows, "uid long, t long, v double")


def test_locf_carries_forward_never_backward(grid):
    out = {
        (r.uid, r.t): r.v_locf
        for r in locf(grid, by="uid", order="t", cols=["v"]).collect()
    }
    assert out[(1, 0)] == 10.0
    assert out[(1, 1)] == 10.0  # carried
    assert out[(1, 3)] == 10.0
    assert out[(1, 4)] == 30.0  # new observation wins
    assert out[(1, 5)] == 30.0
    assert out[(2, 0)] is None  # before first obs: no backfill
    assert out[(2, 1)] is None
    assert out[(2, 3)] == 7.5


def test_interpolate_linear_interior_only(grid):
    out = {
        (r.uid, r.t): r.v_interp
        for r in interpolate_linear(
            grid, by="uid", order="t", col="v"
        ).collect()
    }
    assert out[(1, 0)] == 10.0  # observed rows pass through
    assert out[(1, 1)] == pytest.approx(15.0)
    assert out[(1, 2)] == pytest.approx(20.0)
    assert out[(1, 3)] == pytest.approx(25.0)
    assert out[(1, 4)] == 30.0
    assert out[(1, 5)] is None  # trailing: no extrapolation
    assert out[(2, 0)] is None  # leading: no extrapolation
    assert out[(2, 2)] == 7.5


def test_interpolate_fixedpoint_half_up(spark):
    # midpoint of 1 and 2 (scaled ints) = 1.5 → half-up rounds to 2
    rows = [(1, 0, 1), (1, 1, None), (1, 2, 2)]
    df = spark.createDataFrame(rows, "uid long, t long, x long")
    out = {
        r.t: r.x_interp
        for r in interpolate_linear_fixedpoint(
            df, by="uid", order="t", col="x"
        ).collect()
    }
    assert out[0] == 1 and out[2] == 2
    assert out[1] == 2  # exact rational 3/2, half-up


def test_interpolate_fixedpoint_matches_float_off_boundary(spark):
    rows = [
        (1, 0, 10000),
        (1, 1, None),
        (1, 2, None),
        (1, 3, 40000),
    ]
    df = spark.createDataFrame(rows, "uid long, t long, x long")
    fx = {
        r.t: r.x_interp
        for r in interpolate_linear_fixedpoint(
            df, by="uid", order="t", col="x"
        ).collect()
    }
    fl = {
        r.t: r.v_interp
        for r in interpolate_linear(
            df.withColumn("v", F.col("x").cast("double")),
            by="uid",
            order="t",
            col="v",
        ).collect()
    }
    for t in (1, 2):
        assert fx[t] == round(fl[t])

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.asof import (
    asof_join_pandas,
    asof_join_union,
)
from enclaveid_data_pipeline_spark.operators.skew import (
    replicate_for_salt,
    salted_count_by_key,
)


def _frames(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 100, t(10)), (1, 101, t(20)), (1, 102, t(5)), (2, 200, t(30))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(8), 900), (1, t(20), 901), (2, t(40), 902)],
        "user_id long, ts timestamp, err long",
    )
    return left, right


def test_asof_union_backward_with_ties_and_nulls(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r.asof_err
        for r in asof_join_union(
            left, right, on="ts", by="user_id", value_cols=("err",)
        ).collect()
    }
    assert out[102] is None  # before any error
    assert out[100] == 900  # t8 < t10
    assert out[101] == 901  # tie at t20 counts (<= semantics)
    assert out[200] is None  # user 2's only error is after


def test_asof_pandas_matches_union(spark):
    left, right = _frames(spark)
    a = {
        r.event_id: r.asof_err
        for r in asof_join_union(
            left, right, on="ts", by="user_id", value_cols=("err",)
        ).collect()
    }
    b = {
        r.event_id: r.asof_err
        for r in asof_join_pandas(
            left, right, on="ts", by="user_id", value_cols=("err",)
        ).collect()
    }
    assert a == b


def test_asof_union_null_field_comes_from_matched_row(spark):
    """When the true as-of right row has a NULL in one value column,
    BOTH strategies must return that row's NULL — not backfill the
    field from an older right row (the per-column last-ignorenulls
    bug). Multi-column case pins that all asof_* fields come from the
    same matched row."""
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 100, t(30))], "user_id long, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(10), 900, "old"), (1, t(20), None, "new")],
        "user_id long, ts timestamp, err long, tag string",
    )
    for fn in (asof_join_union, asof_join_pandas):
        rows = fn(
            left, right, on="ts", by="user_id", value_cols=("err", "tag")
        ).collect()
        assert len(rows) == 1, fn.__name__
        # matched row is t20: err is ITS null, tag is ITS value
        assert rows[0].asof_err is None, fn.__name__
        assert rows[0].asof_tag == "new", fn.__name__


def test_asof_pandas_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r.asof_err
        for r in asof_join_pandas(
            left,
            right,
            on="ts",
            by="user_id",
            value_cols=("err",),
            tolerance=pd.Timedelta(minutes=1),
        ).collect()
    }
    assert out[100] is None  # error at t8 is >1min before t10
    assert out[101] == 901  # exact tie within tolerance


def test_salted_count_matches_direct(spark):
    df = spark.createDataFrame(
        [("a",)] * 97 + [("b",)] * 3, "k string"
    )
    salted = {r.k: r.n for r in salted_count_by_key(df, ["k"], buckets=8).collect()}
    assert salted == {"a": 97, "b": 3}


def test_replicate_for_salt(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = replicate_for_salt(df, buckets=4).collect()
    # dunder-prefixed names need item access (Row.__getattr__ guards)
    assert sorted(r["__salt"] for r in out) == [0, 1, 2, 3]


def test_asof_union_forward(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r.asof_err
        for r in asof_join_union(
            left,
            right,
            on="ts",
            by="user_id",
            value_cols=("err",),
            direction="forward",
        ).collect()
    }
    assert out[102] == 900  # t5 → next err t8
    assert out[100] == 901  # t10 → next err t20
    assert out[101] == 901  # tie at t20 counts (>= semantics)
    assert out[200] == 902  # t30 → err t40


def test_asof_union_nearest_tiebreak_and_tolerance(spark):
    left, right = _frames(spark)
    # nearest: t10 is 2min after t8 and 10min before t20 → backward
    out = {
        r.event_id: r.asof_err
        for r in asof_join_union(
            left,
            right,
            on="ts",
            by="user_id",
            value_cols=("err",),
            direction="nearest",
        ).collect()
    }
    assert out[102] == 900  # only forward exists (3min away)
    assert out[100] == 900  # 2min back beats 10min fwd
    assert out[101] == 901  # exact tie gap 0
    assert out[200] == 902  # only forward exists
    # tolerance 150s: every gap >150s becomes NULL
    tol = {
        r.event_id: r.asof_err
        for r in asof_join_union(
            left,
            right,
            on="ts",
            by="user_id",
            value_cols=("err",),
            direction="nearest",
            tolerance=150_000_000,
        ).collect()
    }
    assert tol[102] is None  # 3min > 150s
    assert tol[100] == 900  # 2min ≤ 150s
    assert tol[101] == 901  # gap 0
    assert tol[200] is None  # 10min > 150s


def test_asof_union_matches_pandas_all_directions(spark):
    left, right = _frames(spark)
    for direction in ("backward", "forward", "nearest"):
        a = {
            r.event_id: r.asof_err
            for r in asof_join_union(
                left,
                right,
                on="ts",
                by="user_id",
                value_cols=("err",),
                direction=direction,
                tolerance=600_000_000,
            ).collect()
        }
        b = {
            r.event_id: r.asof_err
            for r in asof_join_pandas(
                left,
                right,
                on="ts",
                by="user_id",
                value_cols=("err",),
                direction=direction,
                tolerance=pd.Timedelta(minutes=10),
            ).collect()
        }
        assert a == b, direction

"""Property test: the join-free union+window as-of rewrite equals
pd.merge_asof for EVERY direction/tolerance over random frames —
not just the hand-picked fixture in test_asof_skew.py. merge_asof is
the independent referee (pandas' own C implementation of the
semantics the operator claims)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from enclaveid_data_pipeline_spark.operators.asof import (
    asof_join_pandas,
    asof_join_union,
)

_SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (user, minute) pairs; minutes unique per user per side (the engine
# contract — duplicate timestamps within a side make the match row
# nondeterministic in both implementations)
_side = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 40)),
    min_size=0,
    max_size=25,
    unique=True,
)


def _frames(spark, left_rows, right_rows):
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (u, i, base + dt.timedelta(minutes=m))
            for i, (u, m) in enumerate(sorted(set(left_rows)))
        ]
        or [(0, 0, base)],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (u, base + dt.timedelta(minutes=m), 1000 + i)
            for i, (u, m) in enumerate(sorted(set(right_rows)))
        ]
        or [(0, base, 999)],
        "user_id long, ts timestamp, err long",
    )
    return left, right


@_SLOW
@given(left_rows=_side, right_rows=_side, tol_min=st.sampled_from([None, 3, 10]))
def test_union_asof_matches_merge_asof_all_directions(
    spark, left_rows, right_rows, tol_min
):
    left, right = _frames(spark, left_rows, right_rows)
    tol_us = None if tol_min is None else tol_min * 60_000_000
    tol_pd = None if tol_min is None else pd.Timedelta(minutes=tol_min)
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
                tolerance=tol_us,
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
                tolerance=tol_pd,
            ).collect()
        }
        assert a == b, (direction, tol_min)

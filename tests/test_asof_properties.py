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


def test_ntz_gap_math_is_session_timezone_independent(spark):
    """Round-6 advice: nearest/tolerance gap math on TIMESTAMP_NTZ
    must not route through the session timezone. Under
    America/New_York, 2026-03-08 02:00 is the spring-forward gap: the
    old cast-through-TIMESTAMP path compressed the naive distance
    between 01:00 and 03:30 from 2.5h to 1.5h (01:00 is EST, 03:30 is
    EDT), flipping nearest into a tie that resolves backward.
    Field-arithmetic micros (timeutils.ntz_micros) keep naive
    semantics whatever the session zone: forward (05:00, 1.5h) wins,
    and tolerance cuts at naive distances."""
    import datetime

    from enclaveid_data_pipeline_spark.operators.asof import asof_join_union

    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        left = spark.createDataFrame(
            [(1, datetime.datetime(2026, 3, 8, 3, 30))],
            "k int, ts timestamp_ntz",
        )
        right = spark.createDataFrame(
            [
                (1, datetime.datetime(2026, 3, 8, 1, 0), "back"),
                (1, datetime.datetime(2026, 3, 8, 5, 0), "fwd"),
            ],
            "k int, ts timestamp_ntz, tag string",
        )
        got = asof_join_union(
            left, right, on="ts", by="k", value_cols=("tag",),
            direction="nearest",
        ).collect()
        assert got[0].asof_tag == "fwd"
        # tolerance in naive µs: 1.5h passes, 1h cuts the match
        ok = asof_join_union(
            left, right, "ts", "k", ("tag",), direction="nearest",
            tolerance=int(1.5 * 3600 * 1_000_000),
        ).collect()
        assert ok[0].asof_tag == "fwd"
        cut = asof_join_union(
            left, right, "ts", "k", ("tag",), direction="nearest",
            tolerance=3600 * 1_000_000 - 1,
        ).collect()
        assert cut[0].asof_tag is None
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)

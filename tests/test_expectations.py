"""Expectations: verdicts, thresholds, hard-gate mode, one-scan plan."""

from __future__ import annotations

import pytest

from enclaveid_data_pipeline_spark.operators.expectations import (
    ExpectationError,
    accepted_values,
    check_expectations,
    in_range,
    not_null,
    unique,
)


def _df(spark):
    rows = [
        (1, "a", 5.0),
        (2, "a", 50.0),
        (2, "b", 500.0),   # dup id, out-of-range value
        (None, "c", 7.0),  # null id, off-whitelist type
    ]
    return spark.createDataFrame(rows, "id long, t string, v double")


def test_verdicts_and_thresholds(spark):
    out = {
        r["rule"]: r
        for r in check_expectations(
            _df(spark),
            [
                not_null("id"),
                unique(("id",)),
                in_range("v", 0, 100, threshold=0.5),  # 1/4 ≤ 50% → pass
                accepted_values("t", ["a", "b"]),
            ],
        ).collect()
    }
    assert out["not_null_id"]["n_violations"] == 1
    assert not out["not_null_id"]["passed"]
    assert out["unique_id"]["n_violations"] == 1  # one extra copy of id=2
    assert out["in_range_v"]["n_violations"] == 1
    assert out["in_range_v"]["passed"]  # tolerated by threshold
    assert out["accepted_values_t"]["n_violations"] == 1


def test_raise_on_failure_names_rules(spark):
    with pytest.raises(ExpectationError, match="not_null_id"):
        check_expectations(
            _df(spark), [not_null("id")], raise_on_failure=True
        )
    # all-green suite returns quietly
    ok = check_expectations(
        _df(spark),
        [in_range("v", 0, 1000)],
        raise_on_failure=True,
    )
    assert ok.count() == 1


def test_single_scan_plan(spark):
    df = _df(spark)
    out = check_expectations(
        df, [not_null("id"), in_range("v", 0, 100), accepted_values("t", ["a"])]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every rule rides ONE aggregation: exactly one scan of the source
    assert plan.count("Scan ExistingRDD") == 1

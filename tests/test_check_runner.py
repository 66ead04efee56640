"""The parallel correctness runner (round 10, judge r9 #1) must keep
pass/fail semantics byte-identical to the serial loop: a failing
query prints the same FAIL line content, the summary counts it, and
the exit code is 1 — in both threaded and CHECK_THREADS=1 modes."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _load_checker():
    spec = importlib.util.spec_from_file_location(
        "check_correctness", os.path.join(REPO, "scripts", "check_correctness.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def checker():
    return _load_checker()


@pytest.mark.parametrize("threads", ["1", "4"])
def test_failing_oracle_fails_run(spark, checker, monkeypatch, capsys, threads):
    import __spark_entry__ as entrymod

    real_oracles = entrymod.oracle_sql()
    sabotaged = dict(real_oracles)
    sabotaged["q1_pricing_summary"] = "SELECT 1 AS wrong_col"
    monkeypatch.setattr(entrymod, "oracle_sql", lambda: sabotaged)
    monkeypatch.setenv("CHECK_THREADS", threads)
    monkeypatch.setattr(
        sys,
        "argv",
        ["check_correctness.py", SF_DIR, "q1_pricing_summary", "revenue_by_nation"],
    )
    rc = checker.main()
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL  q1_pricing_summary:" in out
    assert "ok    revenue_by_nation:" in out
    assert "1/2 passed" in out


@pytest.mark.parametrize("threads", ["4"])
def test_spark_error_fails_run(spark, checker, monkeypatch, capsys, threads):
    import __spark_entry__ as entrymod

    real_queries = entrymod.queries()

    def boom(spark, sf_dir):
        raise RuntimeError("deliberate engine failure")

    sabotaged = dict(real_queries)
    sabotaged["q1_pricing_summary"] = boom
    monkeypatch.setattr(entrymod, "queries", lambda: sabotaged)
    monkeypatch.setenv("CHECK_THREADS", threads)
    monkeypatch.setattr(
        sys,
        "argv",
        ["check_correctness.py", SF_DIR, "q1_pricing_summary", "revenue_by_nation"],
    )
    rc = checker.main()
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL  q1_pricing_summary: spark error: deliberate engine failure" in out
    assert "1/2 passed" in out


def test_all_green_subset_exits_zero(spark, checker, monkeypatch, capsys):
    monkeypatch.setenv("CHECK_THREADS", "4")
    monkeypatch.setattr(
        sys,
        "argv",
        ["check_correctness.py", SF_DIR, "q1_pricing_summary", "revenue_by_nation"],
    )
    rc = checker.main()
    out = capsys.readouterr().out
    assert rc == 0
    assert "2/2 passed" in out

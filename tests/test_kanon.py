"""k-anonymity / l-diversity operator tests: suppression semantics
(including null quasi-values as their own group), report arithmetic
against a dict model, homogeneity detection, and the generalization
ladder's first-within-budget choice."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.kanon import (
    choose_generalization,
    k_anonymity_report,
    l_diversity_failures,
    suppress_small_groups,
)

_SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 2), st.integers(0, 4)),
    min_size=1,
    max_size=60,
)


@_SLOW
@given(rows=_rows, k=st.integers(1, 6))
def test_suppress_and_report_match_model(spark, rows, k):
    df = spark.createDataFrame(
        [(i, a, b, s) for i, (a, b, s) in enumerate(rows)],
        "id long, qa long, qb long, sens long",
    )
    sizes = Counter((a, b) for a, b, _ in rows)
    kept_ids = sorted(
        i for i, (a, b, _) in enumerate(rows) if sizes[(a, b)] >= k
    )
    got_ids = sorted(
        r.id for r in suppress_small_groups(df, ["qa", "qb"], k).collect()
    )
    assert got_ids == kept_ids
    rep = k_anonymity_report(df, ["qa", "qb"], k).collect()[0]
    assert rep.n_groups == len(sizes)
    assert rep.kept_groups == sum(1 for n in sizes.values() if n >= k)
    assert rep.suppressed_groups == rep.n_groups - rep.kept_groups
    assert rep.kept_rows == len(kept_ids)
    assert rep.suppressed_rows == len(rows) - len(kept_ids)


def test_null_quasi_values_form_their_own_group(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "a"), (4, "b")], "id long, q string"
    )
    kept = sorted(r.id for r in suppress_small_groups(df, ["q"], 2).collect())
    # the two NULL-q rows are one group of size 2 (GROUP BY semantics)
    assert kept == [1, 2]


def test_l_diversity_flags_homogeneous_groups_only(spark):
    df = spark.createDataFrame(
        # group (0): 3 rows, 1 sensitive value -> flagged
        # group (1): 3 rows, 3 sensitive values -> diverse
        # group (2): 2 rows, 1 sensitive value -> below k, not flagged
        [(0, "x"), (0, "x"), (0, "x"),
         (1, "x"), (1, "y"), (1, "z"),
         (2, "x"), (2, "x")],
        "q long, sens string",
    )
    got = l_diversity_failures(df, ["q"], "sens", l_min=2, k=3).collect()
    assert [(r.q, r.n_rows, r.n_sensitive) for r in got] == [(0, 3, 1)]


def test_ladder_picks_first_level_within_budget(spark):
    # 10 groups of 1 at the fine level (all suppressed at k=2);
    # one group of 10 at the coarse level (nothing suppressed)
    df = spark.createDataFrame(
        [(i, i, 0) for i in range(10)], "id long, fine long, coarse long"
    )
    ladder = [
        ("fine", [F.col("fine")]),
        ("coarse", [F.col("coarse")]),
    ]
    level, rep = choose_generalization(
        df, ladder, k=2, max_suppressed_fraction=0.05
    )
    assert level == "coarse"
    row = rep.collect()[0]
    assert row.suppressed_rows == 0 and row.kept_rows == 10
    # generous budget keeps the finest level even though it suppresses
    level2, _ = choose_generalization(
        df, ladder, k=2, max_suppressed_fraction=1.0
    )
    assert level2 == "fine"

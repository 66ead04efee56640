"""Delta-join identity: refresh == full recompute for every split,
including deltas that join each other and empty deltas."""

from __future__ import annotations

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.ivm import incremental_join


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_refresh_equals_recompute_all_splits(spark):
    a = spark.createDataFrame(
        [(k, f"a{i}") for i, k in enumerate([1, 1, 2, 3, 5, 5, 8])],
        "k long, av string",
    )
    b = spark.createDataFrame(
        [(k, f"b{i}") for i, k in enumerate([1, 2, 2, 3, 5, 8, 9])],
        "k long, bv string",
    )
    full = a.join(b, "k")
    for am, bm in [(2, 3), (1, 2), (3, 1)]:
        a_old, da = a.filter(F.col("k") % am != 0), a.filter(F.col("k") % am == 0)
        b_old, db = b.filter(F.col("k") % bm != 0), b.filter(F.col("k") % bm == 0)
        view = a_old.join(b_old, "k")
        got = incremental_join(view, a_old, da, b_old, db, "k")
        assert _sorted(got) == _sorted(full), (am, bm)


def test_delta_delta_pairs_counted_once(spark):
    # keys present ONLY in the deltas: their matches must appear
    # exactly once (the ΔA⋈ΔB term must neither drop nor duplicate)
    a = spark.createDataFrame([(1, "ao"), (9, "ad")], "k long, av string")
    b = spark.createDataFrame([(1, "bo"), (9, "bd")], "k long, bv string")
    a_old, da = a.filter("k = 1"), a.filter("k = 9")
    b_old, db = b.filter("k = 1"), b.filter("k = 9")
    got = incremental_join(a_old.join(b_old, "k"), a_old, da, b_old, db, "k")
    assert _sorted(got) == _sorted(a.join(b, "k"))


def test_empty_deltas_are_identity(spark):
    a = spark.createDataFrame([(1, "x")], "k long, av string")
    b = spark.createDataFrame([(1, "y")], "k long, bv string")
    empty_a = a.filter("k < 0")
    empty_b = b.filter("k < 0")
    view = a.join(b, "k")
    got = incremental_join(view, a, empty_a, b, empty_b, "k")
    assert _sorted(got) == _sorted(view)

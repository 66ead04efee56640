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


def test_maintain_sum_count_view_two_batches_equals_recompute(spark):
    from enclaveid_data_pipeline_spark.operators.cdc import table_changes
    from enclaveid_data_pipeline_spark.operators.ivm import (
        maintain_sum_count_view,
    )

    s0 = spark.createDataFrame(
        [(1, "g1", 10), (2, "g1", 20), (3, "g2", 30)],
        "k int, g string, v long",
    )
    # batch 1: update k=2 value, move k=3 g2->g3, insert k=4 in g2
    s1 = spark.createDataFrame(
        [(1, "g1", 10), (2, "g1", 25), (3, "g3", 30), (4, "g2", 40)],
        "k int, g string, v long",
    )
    # batch 2: delete k=1, delete k=4 (empties g2), update k=3 value
    s2 = spark.createDataFrame(
        [(2, "g1", 25), (3, "g3", 35)],
        "k int, g string, v long",
    )

    def agg(df):
        from pyspark.sql import functions as F

        return df.groupBy("g").agg(
            F.sum("v").alias("v"), F.count(F.lit(1)).alias("n_rows")
        )

    view = agg(s0)
    for prev, cur in ((s0, s1), (s1, s2)):
        feed = table_changes(prev, cur, ["k"]).withColumnRenamed("v", "v")
        view = maintain_sum_count_view(
            view, feed, group_keys=["g"], sum_cols=["v"]
        )

    got = {(r["g"], r["v"], r["n_rows"]) for r in view.collect()}
    want = {(r["g"], r["v"], r["n_rows"]) for r in agg(s2).collect()}
    assert got == want
    # g2 was emptied by batch 2 and must have dropped out
    assert not any(g == "g2" for g, _, _ in got)


def test_refresh_touched_groups_minmax_equals_recompute(spark):
    """Delete the group minimum — the case pure retraction cannot
    maintain — plus a group move and a full-group delete; the
    partially-recomputed view must equal a from-scratch aggregate,
    and untouched groups' rows must carry over unrecomputed."""
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.operators.cdc import table_changes
    from enclaveid_data_pipeline_spark.operators.ivm import (
        refresh_touched_groups,
    )

    s0 = spark.createDataFrame(
        [
            (1, "g1", 10),
            (2, "g1", 20),
            (3, "g2", 30),
            (4, "g2", 5),
            (5, "g3", 7),
        ],
        "k int, g string, v long",
    )
    # delete k=4 (g2's min), move k=5 g3->g1 (empties g3), insert k=6
    s1 = spark.createDataFrame(
        [
            (1, "g1", 10),
            (2, "g1", 20),
            (3, "g2", 30),
            (5, "g1", 7),
            (6, "g4", 2),
        ],
        "k int, g string, v long",
    )

    def agg(df):
        return df.groupBy("g").agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )

    feed = table_changes(s0, s1, ["k"])
    got = refresh_touched_groups(
        agg(s0),
        s1,
        feed,
        ["g"],
        {"lo": ("min", "v"), "hi": ("max", "v"), "n": ("count", "*")},
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in agg(s1).collect()
    }

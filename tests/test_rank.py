"""Bucketed global-order primitives (operators/rank.py): exact
parity with the single-task unpartitioned window they replace, plus
the plan contract — no unpartitioned WindowExec anywhere."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.rank import (
    global_cumsum,
    global_percent_rank,
    global_row_number,
    monotone_bucket,
    string_prefix_bucket,
)


def _toy(spark, n=500):
    # Deterministic scores with collisions on the score itself (the
    # id tiebreak makes the total order unique, as at the call sites)
    return spark.range(n).select(
        F.col("id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(97)) / 10.0).alias("score"),
        F.pmod(F.col("id") * 13, F.lit(5)).alias("wt"),
    )


def _no_unpartitioned_window(df) -> None:
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window [" not in line:
            continue
        # partitioned+ordered renders three bracket groups ([exprs],
        # [partition], [order]) => two "], [" seams. One seam is
        # ambiguous: partitioned-unordered (fine — [exprs], [part])
        # vs unpartitioned-ordered (the single-task trap — [exprs],
        # [order]); the order group is the one carrying ASC/DESC.
        if line.count("], [") < 2:
            tail = line.rsplit("], [", 1)[-1]
            assert " ASC" not in tail and " DESC" not in tail, (
                f"unpartitioned ordered window: {line}"
            )


@pytest.mark.parametrize("nbuckets", [1, 8, 64])
def test_global_row_number_parity(spark, nbuckets):
    df = _toy(spark)
    order = [F.asc("score"), F.asc("id")]
    got = global_row_number(
        df, order, monotone_bucket(F.col("score"), 0.0, 9.7, nbuckets)
    )
    ref = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert (
        got.join(ref.withColumnRenamed("rn", "ref_rn"), "id")
        .filter(F.col("rn") != F.col("ref_rn"))
        .count()
        == 0
    )
    _no_unpartitioned_window(got)


def test_global_percent_rank_parity(spark):
    df = _toy(spark)
    order = [F.asc("score"), F.asc("id")]
    got = global_percent_rank(
        df, order, monotone_bucket(F.col("score"), 0.0, 9.7, 16)
    )
    ref = df.withColumn("pr", F.percent_rank().over(Window.orderBy(*order)))
    joined = got.join(ref.withColumnRenamed("pr", "ref_pr"), "id")
    # bit-identical double division, not approximate
    assert joined.filter(F.col("pr") != F.col("ref_pr")).count() == 0
    _no_unpartitioned_window(got)


def test_global_percent_rank_single_row(spark):
    df = spark.range(1).select(F.col("id"), F.lit(3.0).alias("score"))
    got = global_percent_rank(
        df, [F.asc("score"), F.asc("id")], F.lit(0)
    )
    assert got.collect()[0]["pr"] == 0.0


@pytest.mark.parametrize("inclusive", [True, False])
def test_global_cumsum_parity(spark, inclusive):
    df = _toy(spark)
    order = [F.desc("score"), F.asc("id")]
    # descending order => bucket must DESCEND with score
    bucket = monotone_bucket(-F.col("score"), -9.7, 0.0, 32)
    got = global_cumsum(
        df, F.col("wt"), order, bucket, inclusive=inclusive
    )
    hi = Window.currentRow if inclusive else -1
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, hi)
    ref = df.withColumn(
        "cum", F.coalesce(F.sum("wt").over(w), F.lit(0))
    )
    assert (
        got.join(ref.withColumnRenamed("cum", "ref_cum"), "id")
        .filter(F.col("cum") != F.col("ref_cum"))
        .count()
        == 0
    )
    _no_unpartitioned_window(got)


def test_monotone_bucket_clamps_and_orders(spark):
    df = spark.range(200).select(
        (F.col("id") / 10.0 - 5.0).alias("v")
    )  # range [-5, 14.9] vs declared [0, 10]
    b = df.select(
        "v", monotone_bucket(F.col("v"), 0.0, 10.0, 8).alias("b")
    )
    rows = sorted(b.collect(), key=lambda r: r["v"])
    assert rows[0]["b"] == 0 and rows[-1]["b"] == 7
    for lo, hi in zip(rows, rows[1:]):
        assert lo["b"] <= hi["b"]


def test_string_prefix_bucket_monotone(spark):
    vals = ["", "a", "ab", "az", "b", "ba", "z9 x", "  lead", "0num"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    rows = df.select(
        "s", string_prefix_bucket(F.col("s")).alias("b")
    ).collect()
    by_s = sorted(rows, key=lambda r: r["s"])
    for lo, hi in zip(by_s, by_s[1:]):
        assert lo["b"] <= hi["b"], (lo, hi)


def test_parallelism_matches_bucket_count(spark):
    """The heavy window runs one task per bucket — the contract that
    distinguishes this from the single-task global window."""
    df = _toy(spark, n=2000)
    got = global_row_number(
        df,
        [F.asc("score"), F.asc("id")],
        monotone_bucket(F.col("score"), 0.0, 9.7, 64),
    )
    dist = got.withColumn("p", F.spark_partition_id())
    npart = dist.select("p").distinct().count()
    assert npart > 1


def test_sampled_range_bucket_skewed_key(spark):
    """Adaptive buckets keep a heavily skewed numeric key parallel
    AND exact: 90% of mass in [0, 0.1), long tail above — fixed-width
    buckets would pile everything into bucket 0."""
    from enclaveid_data_pipeline_spark.operators.rank import (
        with_sampled_range_bucket,
    )

    df = spark.range(1000).select(
        "id",
        F.when(F.col("id") % 10 < 9, (F.col("id") % 97) / 1000.0)
        .otherwise(10.0 + F.col("id"))
        .alias("score"),
    )
    b = with_sampled_range_bucket(df, F.col("score"), n=16)
    order = [F.asc("score"), F.asc("id")]
    got = global_row_number(b, order, F.col("__rbucket")).drop("__rbucket")
    ref = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert (
        got.join(ref.withColumnRenamed("rn", "ref_rn"), "id")
        .filter(F.col("rn") != F.col("ref_rn"))
        .count()
        == 0
    )
    # the skewed low range spreads over multiple buckets
    nb = b.filter(F.col("score") < 0.1).select("__rbucket").distinct().count()
    assert nb > 1
    _no_unpartitioned_window(got)


def test_snm_neighbor_pairs_common_prefix_keys(spark):
    """Adversarial SNM keys sharing a long common prefix: results
    stay exactly the LEAD form's whatever the bucket collapse, and a
    bucket_chars past the shared prefix restores parallelism."""
    from enclaveid_data_pipeline_spark.operators.dedup import (
        snm_neighbor_pairs,
    )
    from enclaveid_data_pipeline_spark.operators.rank import (
        string_prefix_bucket,
    )

    rows = [
        (i, "the" + chr(97 + (i * 7) % 26) + f"tail{i:03d}")
        for i in range(120)
    ]
    keyed = spark.createDataFrame(rows, "doc_id long, snm_key string")
    w = 4

    def canon(df):
        return sorted(
            (r["left_id"], r["right_id"]) for r in df.collect()
        )

    ref = keyed.select(
        "doc_id",
        *[
            F.lead("doc_id", k)
            .over(Window.orderBy("snm_key", "doc_id"))
            .alias(f"r{k}")
            for k in range(1, w)
        ],
    )
    ref_pairs = sorted(
        (r["doc_id"], r[f"r{k}"])
        for r in ref.collect()
        for k in range(1, w)
        if r[f"r{k}"] is not None
    )
    for chars in (2, 4):
        got = snm_neighbor_pairs(keyed, w, bucket_chars=chars)
        assert canon(got) == ref_pairs, f"chars={chars}"
    # 2-char buckets collapse under the shared "th" prefix; 4-char
    # buckets see past it
    b2 = keyed.select(
        string_prefix_bucket(F.col("snm_key"), 2).alias("b")
    ).distinct().count()
    b4 = keyed.select(
        string_prefix_bucket(F.col("snm_key"), 4).alias("b")
    ).distinct().count()
    assert b2 == 1 and b4 > 1

"""Incremental rollup maintenance: merge(agg(A), agg(B)) == agg(A∪B)
exactly, counts fold by sum, non-mergeable kinds rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.rollup import (
    merge_rollups,
    rollup_partials,
    with_ratio,
)

KEYS = ("k",)
MEASURES = {
    "s": ("sum", "v"),
    "n": ("count", "*"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _rows(df):
    return {
        tuple(r[k] for k in ("k", "s", "n", "lo", "hi"))
        for r in df.collect()
    }


def test_merge_equals_full_recompute(spark):
    data = spark.createDataFrame(
        [(i % 4, i, float(i * 3 % 17)) for i in range(200)],
        "k int, id int, v double",
    )
    full = rollup_partials(data, KEYS, MEASURES)
    # three uneven batches, folded sequentially
    b0 = data.filter(F.col("id") % 5 <= 1)
    b1 = data.filter(F.col("id") % 5 == 2)
    b2 = data.filter(F.col("id") % 5 >= 3)
    r = rollup_partials(b0, KEYS, MEASURES)
    for b in (b1, b2):
        r = merge_rollups(r, rollup_partials(b, KEYS, MEASURES), KEYS, MEASURES)
    assert _rows(r) == _rows(full)


def test_new_keys_appear_and_counts_fold_by_sum(spark):
    a = spark.createDataFrame([(1, 10.0), (1, 20.0)], "k int, v double")
    b = spark.createDataFrame([(1, 5.0), (2, 7.0)], "k int, v double")
    r = merge_rollups(
        rollup_partials(a, KEYS, MEASURES),
        rollup_partials(b, KEYS, MEASURES),
        KEYS,
        MEASURES,
    )
    out = {row.k: row for row in r.collect()}
    assert out[1].n == 3 and out[1].s == 35.0  # not a count of partials (2)
    assert out[2].n == 1 and out[2].s == 7.0   # new key surfaced
    avg = {row.k: row.avg for row in with_ratio(r, "avg", "s", "n").collect()}
    assert avg[1] == round(35.0 / 3, 6)


def test_non_mergeable_kind_rejected(spark):
    df = spark.createDataFrame([(1, 1.0)], "k int, v double")
    with pytest.raises(ValueError, match="not mergeable"):
        rollup_partials(df, KEYS, {"a": ("avg", "v")})


def test_hll_kind_merges_and_estimates(spark):
    m = {"sk": ("hll", "u"), "n": ("count", "*")}
    data = spark.createDataFrame(
        [(i % 3, f"u{i % 997}") for i in range(5000)], "k int, u string"
    )
    full = rollup_partials(data, KEYS, m)
    b0 = data.filter(F.col("u") < "u5")
    b1 = data.filter(F.col("u") >= "u5")
    merged = merge_rollups(
        rollup_partials(b0, KEYS, m), rollup_partials(b1, KEYS, m), KEYS, m
    )
    from enclaveid_data_pipeline_spark.operators.rollup import with_estimate

    est_m = {r.k: r.est for r in with_estimate(merged, "est", "sk").collect()}
    est_f = {r.k: r.est for r in with_estimate(full, "est", "sk").collect()}
    exact = {
        r.k: r.n
        for r in data.groupBy("k")
        .agg(F.countDistinct("u").alias("n"))
        .collect()
    }
    for k in exact:
        # union result tracks both the single-pass sketch and truth
        assert abs(est_m[k] - est_f[k]) / est_f[k] <= 0.02
        assert abs(est_m[k] - exact[k]) / exact[k] <= 0.1


def test_kll_kind_merges_and_answers_quantiles(spark):
    """Quantile sketches fold per batch: the folded median must track
    both the single-pass sketch and the exact percentile (KLL rank
    error is ~1.7% at default k; the 1000-value grid makes 5% a
    generous but non-vacuous band), and each key keeps its own
    distribution."""
    from enclaveid_data_pipeline_spark.operators.rollup import with_quantile

    measures = {"q": ("kll", "v"), "n": ("count", "*")}
    # key 0: values 0..999; key 1: odd values 1..1997
    data = spark.createDataFrame(
        [
            (i % 2, float(i // 2) if i % 2 == 0 else float(i // 2 * 2 + 1))
            for i in range(2000)
        ],
        "k int, v double",
    )
    full = rollup_partials(data, KEYS, measures)
    r = None
    for m in range(4):  # four uneven batches folded sequentially
        part = rollup_partials(
            data.filter(F.col("v").cast("int") % 4 == m), KEYS, measures
        )
        r = part if r is None else merge_rollups(r, part, KEYS, measures)

    med_folded = {
        row.k: row.med
        for row in with_quantile(r, "med", "q", 0.5).collect()
    }
    med_single = {
        row.k: row.med
        for row in with_quantile(full, "med", "q", 0.5).collect()
    }
    exact = {
        row.k: row.m
        for row in data.groupBy("k")
        .agg(F.expr("percentile(v, 0.5)").alias("m"))
        .collect()
    }
    for k, ex in exact.items():
        spread = ex  # medians are ~500 / ~1000 on 0-based grids
        assert abs(med_folded[k] - ex) <= 0.05 * spread + 1, (k, med_folded[k], ex)
        assert abs(med_single[k] - ex) <= 0.05 * spread + 1
    # merged row count still exact alongside the sketch
    ns = {row.k: row.n for row in r.collect()}
    assert ns == {0: 1000, 1: 1000}

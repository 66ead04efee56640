from __future__ import annotations

import math

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    with_norm,
)


def _vec_df(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
            (2, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
            (3, [1.0, 1.0, 0.0], [1.0, 0.0, 0.0]),
            (4, None, [1.0, 0.0, 0.0]),
        ],
        "id long, a array<double>, b array<double>",
    )


def test_dot_and_norm(spark):
    df = _vec_df(spark)
    rows = {
        r.id: r
        for r in df.select(
            "id",
            dot_product(F.col("a"), F.col("b")).alias("dot"),
            l2_norm(F.col("b")).alias("nb"),
        ).collect()
    }
    assert rows[1].dot == 0.0
    assert rows[2].dot == 14.0
    assert rows[1].nb == 1.0


def test_cosine_basics_and_null(spark):
    df = _vec_df(spark)
    rows = {
        r.id: r.cos
        for r in df.select(
            "id", cosine_similarity(F.col("a"), F.col("b")).alias("cos")
        ).collect()
    }
    assert rows[1] == 0.0
    assert abs(rows[2] - 1.0) < 1e-12
    assert abs(rows[3] - 1 / math.sqrt(2)) < 1e-12
    assert rows[4] is None  # NULL vector → NULL similarity (P6 contract)


def test_precomputed_norm_matches(spark):
    df = with_norm(_vec_df(spark).filter("a is not null"), "a", "na")
    out = df.select(
        (
            cosine_similarity(F.col("a"), F.col("b"), a_norm=F.col("na"))
            - cosine_similarity(F.col("a"), F.col("b"))
        ).alias("diff")
    ).collect()
    assert all(abs(r.diff) < 1e-12 for r in out)

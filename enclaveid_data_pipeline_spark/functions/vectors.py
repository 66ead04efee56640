"""Vector-column math (SURVEY §2.8 F12).

The reference stores 1024-d embeddings in pgvector and computes
``1 - (a.embedding <=> b.embedding)`` (cosine similarity) inside
Postgres (reference assets/recent_history.py:311,409,474). Here the
embedding is a plain ``array<float>``/``array<double>`` column and
cosine is a native Catalyst expression built from higher-order
functions — JVM-side, codegen-friendly, no Python UDF on the hot path.

All math is done in DOUBLE: inputs are cast element-wise first so the
result is engine-portable (float32 intermediates differ across
engines; doubles with a fixed fold order are reproducible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """``sum_i a_i * b_i`` via zip_with + aggregate (no UDF)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(
    a: Column,
    b: Column,
    a_norm: Column | None = None,
    b_norm: Column | None = None,
) -> Column:
    """Cosine similarity; NULL when either side is NULL (the reference
    drops the LAG-first-row NULL, assets/recent_history.py:318-325).

    Pass precomputed norms (:func:`with_norm`) on self-join paths —
    the reference recomputes ``<=>`` per pair; precomputing the norm
    once per row halves the flops at 100 TB (SURVEY §4.3.1).
    """
    an = a_norm if a_norm is not None else l2_norm(a)
    bn = b_norm if b_norm is not None else l2_norm(b)
    return dot_product(a, b) / (an * bn)


def with_norm(df: DataFrame, vec_col: str, out_col: str = "norm") -> DataFrame:
    """Materialize the L2 norm once per row before a pairwise join."""
    return df.withColumn(out_col, l2_norm(F.col(vec_col)))

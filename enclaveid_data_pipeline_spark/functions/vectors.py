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


def as_double(v: Column) -> Column:
    """Element-wise cast to double — do this ONCE PER ROW before a
    pairwise join so the per-PAIR dot product skips two array casts.
    Measured ~25% off the pairwise-similarity suite at sf0.1. (An
    unrolled fixed-dim ``element_at`` sum was also tried and measured
    ~3× SLOWER than the HOF fold — codegen size beats allocation
    here — so the fold is the only implementation.)
    """
    return _as_double(v)


def dot_product(a: Column, b: Column, assume_double: bool = False) -> Column:
    """``sum_i a_i * b_i`` via zip_with + aggregate (no UDF).

    ``assume_double=True`` skips the element casts; callers must have
    applied :func:`as_double` (values are then bit-identical either
    way — same left fold from 0.0)."""
    ad = a if assume_double else _as_double(a)
    bd = b if assume_double else _as_double(b)
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column, assume_double: bool = False) -> Column:
    ad = a if assume_double else _as_double(a)
    return F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(
    a: Column,
    b: Column,
    a_norm: Column | None = None,
    b_norm: Column | None = None,
    assume_double: bool = False,
) -> Column:
    """Cosine similarity; NULL when either side is NULL (the reference
    drops the LAG-first-row NULL, assets/recent_history.py:318-325).

    Pass precomputed norms (:func:`with_norm`) on self-join paths —
    the reference recomputes ``<=>`` per pair; precomputing the norm
    once per row halves the flops at 100 TB (SURVEY §4.3.1). On
    pairwise paths also pre-cast with :func:`as_double` and set
    ``assume_double`` so the casts happen per row, not per pair.
    """
    an = a_norm if a_norm is not None else l2_norm(a, assume_double=assume_double)
    bn = b_norm if b_norm is not None else l2_norm(b, assume_double=assume_double)
    return dot_product(a, b, assume_double=assume_double) / (an * bn)


def with_norm(df: DataFrame, vec_col: str, out_col: str = "norm") -> DataFrame:
    """Materialize the L2 norm once per row before a pairwise join."""
    return df.withColumn(out_col, l2_norm(F.col(vec_col)))

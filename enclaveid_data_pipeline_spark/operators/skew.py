"""Skew-handling utilities (SURVEY §7 scale hardening).

First line of defense is AQE's skew-join splitting (enabled in
session.get_spark). Salting is for the cases AQE can't fix: skewed
AGGREGATION keys (two-phase salted aggregate) and skewed join keys
where the build side can be replicated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, out_col: str = "__salt") -> DataFrame:
    """Uniform random salt in [0, buckets) — for the probe side of a
    salted join or phase one of a salted aggregation."""
    return df.withColumn(
        out_col, (F.rand(seed=42) * buckets).cast("int")
    )


def replicate_for_salt(
    df: DataFrame, buckets: int, out_col: str = "__salt"
) -> DataFrame:
    """Explode each row into ``buckets`` copies, one per salt value —
    the build side of a salted join (join key becomes (key, salt))."""
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(buckets - 1))
    )
    return df.withColumn(out_col, salts)


def salted_count_by_key(
    df: DataFrame, key_cols: list[str], buckets: int = 16
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial count per
    (key, salt) — spreads one hot key over ``buckets`` reducers —
    then final sum per key. For algebraic aggregates Spark's own
    partial aggregation usually suffices; salting matters when the
    first shuffle itself hot-spots (e.g. high-cardinality payloads
    riding along, or distinct-aggregates pinning a key to one task).
    """
    phase1 = (
        with_salt(df, buckets)
        .groupBy(*key_cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return phase1.groupBy(*key_cols).agg(
        F.sum("__partial").alias("n")
    )

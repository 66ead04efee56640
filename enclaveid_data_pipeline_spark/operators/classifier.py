"""Linear text-classifier inference (fastText-shaped quality filter).

Production corpora gate documents with cheap learned linear models —
fastText-style quality/language filters scoring billions of docs
before any expensive model sees them. The inference plan is what
this module provides; the weights normally arrive from offline
training as a (feature_id, weight) table. Here the demo weights are
derived deterministically from md5 so the DuckDB oracle can replay
scoring end-to-end — swap :func:`demo_weight_table` for a real
trained table and nothing else changes.

The 100 TB inference shape, all native expressions:

- tokenize (split) → explode → FEATURE HASH to a fixed id space
  (md5 → mod n_features; collisions are the standard hashing-trick
  trade, bounded by n_features),
- one BROADCAST equi-join against the weight table (n_features rows
  — KBs to a few MBs; never a shuffle of the corpus side),
- per-doc partial-aggregated mean weight → sigmoid.

Mean (not sum) pooling so the score is length-invariant — fastText's
average-of-embeddings analog for the scalar case. No UDFs anywhere;
the whole plan is one explode + one broadcast join + one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def feature_hash(token, n_features: int, seed: str = "qcls"):
    """Hashing-trick feature id in [0, n_features): first 7 hex
    digits of md5(seed|token) mod n_features — same double-hash
    discipline as operators.dedup.shingle_hashes, replayable in
    SQL."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + "|"), token)), 1, 7),
            16,
            10,
        ).cast("long")
        % n_features
    )


def demo_weight_table(
    spark: SparkSession, n_features: int, seed: str = "w"
) -> DataFrame:
    """Deterministic stand-in for trained weights: weight(f) uniform
    in [-1, 1) from the first 7 hex digits of md5(seed|f). A real
    deployment loads (feature_id, weight) parquet instead."""
    return spark.range(n_features).select(
        F.col("id").alias("feature_id"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(seed + "|"), F.col("id").cast("string"))),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16**7))
            * 2.0
            - 1.0
        ).alias("weight"),
    )


def hashed_linear_scores(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1024,
    seed: str = "qcls",
    out_col: str = "score",
) -> DataFrame:
    """Score every document with the linear model: sigmoid of the
    MEAN weight of its hashed whitespace tokens. ``weights`` is a
    (feature_id, weight) table, broadcast (it is n_features rows by
    construction). Docs whose token list is empty score NULL —
    surfaced, not defaulted, because a quality gate must see "no
    evidence" as its own state."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
    ).withColumn("feature_id", feature_hash(F.col("__tok"), n_features, seed))
    scored = (
        toks.join(F.broadcast(weights), "feature_id")
        .groupBy(id_col)
        .agg(F.avg("weight").alias("__mean_w"))
        .withColumn(
            out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__mean_w")))
        )
        .drop("__mean_w")
    )
    return docs.select(id_col).join(scored, id_col, "left")

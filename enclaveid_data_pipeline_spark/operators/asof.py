"""As-of join (nearest-predecessor lookup) — SURVEY §2.3 notes Spark
lacks this as a named feature; the engine provides two strategies:

1. :func:`asof_join_union` — the SCALE path: union both sides with a
   side tag, one window pass per key carries the last right-side
   value forward (``last_value IGNORE NULLS``), then filter back to
   left rows. No join at all: one shuffle+sort per key, linear in
   rows, immune to the range-explosion a naive band join risks.
2. :func:`asof_join_pandas` — per-key ``applyInPandas`` over
   ``pd.merge_asof`` for when the semantics get richer (tolerance,
   direction, multiple by-columns); one key group per worker.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: tuple[str, ...],
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """For every left row, attach the as-of matching right row within
    the same ``by`` group (NULLs when no match):

    - ``backward`` (default): most recent right row with
      ``right.on <= left.on``;
    - ``forward``: earliest right row with ``right.on >= left.on``;
    - ``nearest``: whichever of the two is closer on ``on``; equal
      gaps resolve to the backward match (pd.merge_asof parity).

    ``tolerance`` (optional) bounds the match distance in the
    ``on`` column's native units — MICROSECONDS for timestamps,
    raw difference for numerics; a nearest-but-too-far match becomes
    NULL (pd.merge_asof tolerance semantics: tolerance never falls
    back to the second-nearest row). Equal timestamps match in every
    direction (gap 0).

    Output: all left columns + ``asof_<c>`` for each value column.

    The right side rides as ONE struct column (carrying its own
    ``on`` value for gap math) and the window fills
    ``last/first(struct) IGNORE NULLS`` — all ``asof_*`` outputs
    come from the SAME matched right row. (Per-column fill would
    backfill a NULL field of the true match from a different right
    row, diverging from pd.merge_asof / :func:`asof_join_pandas`,
    which return the matched row's NULL.)

    Scale shape: still no join — one shuffle of the unioned frame on
    ``by``; ``nearest`` adds a second sort (opposite tie order)
    within the same partitioning, not a second shuffle.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = left.columns
    on_type = left.schema[on].dataType
    struct_type = T.StructType(
        [T.StructField("__on", on_type)]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    tagged_left = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c not in (by, on)],
        F.lit(None).cast(struct_type).alias("__r"),
    )
    tagged_right = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in (by, on)
        ],
        F.struct(
            F.col(on).alias("__on"),
            *[F.col(c) for c in value_cols],
        ).alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    def _scalar(c):
        # gap math in the on-column's native units (µs for both
        # timestamp flavors). NTZ goes through field arithmetic
        # (timeutils.ntz_micros), never a session-zone cast: under a
        # DST session zone, casting NTZ→TIMESTAMP shifts values
        # straddling a transition by different offsets, skewing the
        # nearest-direction choice and tolerance cutoffs (round-6
        # advice — this operator is public API and must not depend
        # on the engine session's UTC pin).
        if isinstance(on_type, T.TimestampNTZType):
            from ..functions.timeutils import ntz_micros

            return ntz_micros(c)
        if isinstance(on_type, T.TimestampType):
            return F.unix_micros(c)
        return c

    filled = unioned
    if direction in ("backward", "nearest"):
        # right sorts BEFORE left at equal on → equal-ts rows match
        w_b = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = filled.withColumn(
            "__back", F.last(F.col("__r"), ignorenulls=True).over(w_b)
        )
    if direction in ("forward", "nearest"):
        # left sorts BEFORE right at equal on → equal-ts rows land in
        # the [current, following] frame
        w_f = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("__side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        filled = filled.withColumn(
            "__fwd", F.first(F.col("__r"), ignorenulls=True).over(w_f)
        )

    if direction == "backward":
        chosen = F.col("__back")
    elif direction == "forward":
        chosen = F.col("__fwd")
    else:
        gap_b = _scalar(F.col(on)) - _scalar(F.col("__back.__on"))
        gap_f = _scalar(F.col("__fwd.__on")) - _scalar(F.col(on))
        chosen = (
            F.when(F.col("__fwd").isNull(), F.col("__back"))
            .when(F.col("__back").isNull(), F.col("__fwd"))
            .when(gap_b <= gap_f, F.col("__back"))
            .otherwise(F.col("__fwd"))
        )
    if tolerance is not None:
        gap = F.abs(_scalar(F.col(on)) - _scalar(chosen["__on"]))
        chosen = F.when(gap <= F.lit(tolerance), chosen)
    filled = filled.withColumn("__asof", chosen)
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *[F.col(c) for c in lcols],
            *[F.col(f"__asof.{c}").alias(f"asof_{c}") for c in value_cols],
        )
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: tuple[str, ...],
    tolerance: pd.Timedelta | None = None,
    direction: str = "backward",
) -> DataFrame:
    """pd.merge_asof per ``by`` group (cogroup applyInPandas) — the
    reference-semantics twin (tolerance windows, backward/forward/
    nearest) used to cross-check :func:`asof_join_union`;
    per-group single-worker bound."""
    out_schema = T.StructType(
        list(left.schema.fields)
        + [
            T.StructField(f"asof_{c}", right.schema[c].dataType)
            for c in value_cols
        ]
    )

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_sorted = l_pdf.sort_values(on, kind="mergesort")
        r_sorted = r_pdf.sort_values(on, kind="mergesort")[
            [on] + list(value_cols)
        ].rename(columns={c: f"asof_{c}" for c in value_cols})
        merged = pd.merge_asof(
            l_sorted,
            r_sorted,
            on=on,
            direction=direction,
            tolerance=tolerance,
        )
        return merged

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )

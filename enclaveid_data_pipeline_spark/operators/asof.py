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
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group (NULLs when
    no predecessor). Ties on ``on`` resolve to the right row (the
    union sorts right rows before left at equal timestamps).

    Output: all left columns + ``asof_<c>`` for each value column.

    The right side rides as ONE struct column and the window carries
    ``last(struct) IGNORE NULLS`` — all ``asof_*`` outputs come from
    the SAME matched right row. (Per-column last-ignorenulls would
    backfill a NULL field of the true match from an older right row,
    diverging from pd.merge_asof / :func:`asof_join_pandas`, which
    return the matched row's NULL.)
    """
    lcols = left.columns
    struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
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
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*", F.last(F.col("__r"), ignorenulls=True).over(w).alias("__asof")
    )
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
) -> DataFrame:
    """pd.merge_asof per ``by`` group (cogroup applyInPandas) — richer
    semantics (tolerance windows), per-group single-worker bound."""
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
            direction="backward",
            tolerance=tolerance,
        )
        return merged

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )

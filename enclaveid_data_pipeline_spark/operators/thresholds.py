"""Learned thresholds as grouped subqueries (SURVEY §2.4 A2, §2.12 X7).

The reference computes two per-user scalars in Postgres — the 10th
percentile of inter-session gaps (``time_threshold``,
assets/recent_history.py:248-292) and the 90th percentile of
adjacent-session cosine similarity (``similarity_threshold``,
299-341) — fetches each to the Python driver, and interpolates them
into later SQL strings. In-engine, a scalar-per-user is just a grouped
aggregate joined (broadcast) back on ``user_id``: no driver round
trip, and the whole chain stays one Catalyst plan.

Spark's ``percentile`` is the exact percentile_cont-style aggregate
(linear interpolation), matching the Postgres/DuckDB oracle. It holds
per-group values in memory — fine per-user; at 100 TB switch the
``approx`` flag on to use ``percentile_approx`` (documented semantic
difference, SURVEY §7.3 hard part 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_percentile(
    df: DataFrame,
    value_col: str,
    p: float,
    group_cols: tuple[str, ...] = ("user_id",),
    out_col: str = "threshold",
    approx: bool = False,
) -> DataFrame:
    """One row per group: exact (or approx) percentile of ``value_col``.

    NULLs in ``value_col`` are ignored (Postgres percentile_cont
    semantics; the reference's WHERE IS NOT NULL does the same)."""
    if approx:
        agg = F.percentile_approx(value_col, p)
    else:
        agg = F.percentile(value_col, F.lit(p))
    return df.groupBy(*group_cols).agg(agg.alias(out_col))


def with_group_threshold(
    df: DataFrame,
    value_col: str,
    p: float,
    group_cols: tuple[str, ...] = ("user_id",),
    out_col: str = "threshold",
    approx: bool = False,
) -> DataFrame:
    """Attach the per-group percentile back onto every row.

    Implemented as an aggregate + broadcast equi-join rather than a
    window: the aggregate output is tiny (one row per group), so the
    join side broadcasts and the big side never re-sorts.
    """
    thresholds = group_percentile(
        df, value_col, p, group_cols=group_cols, out_col=out_col, approx=approx
    )
    return df.join(F.broadcast(thresholds), on=list(group_cols), how="left")


def winsorize(
    df: DataFrame,
    value_col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
    group_cols: tuple[str, ...] = ("user_id",),
    out_col: str | None = None,
    approx: bool = False,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lo_p, hi_p] percentile
    band — the standard outlier treatment before a float feature
    feeds a model. Same plan discipline as
    :func:`with_group_threshold`: both band edges come from ONE tiny
    grouped aggregate, broadcast back, so the corpus is never sorted
    and never re-shuffled; the clip itself is a row-local
    least/greatest. ``approx=True`` swaps in percentile_approx for
    the 100 TB path (exact percentile shuffles every value of a
    group to one reducer)."""
    out = out_col or f"{value_col}_winsorized"
    pct = F.percentile_approx if approx else F.percentile
    band = df.groupBy(*group_cols).agg(
        pct(F.col(value_col).cast("double"), F.lit(float(lo_p))).alias("__lo"),
        pct(F.col(value_col).cast("double"), F.lit(float(hi_p))).alias("__hi"),
    )
    return (
        df.join(F.broadcast(band), on=list(group_cols), how="left")
        .withColumn(
            out,
            F.least(
                F.greatest(F.col(value_col).cast("double"), F.col("__lo")),
                F.col("__hi"),
            ),
        )
        .drop("__lo", "__hi")
    )

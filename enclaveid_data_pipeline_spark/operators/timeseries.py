"""Time-series gap-fill fills: LOCF and linear interpolation over a
densified grid.

The reference pipeline leaves calendar densification to its Postgres
layer (hypertable-style ``time_bucket_gapfill`` + ``locf`` /
``interpolate``); here the fills are first-class DataFrame operators
over any already-spined frame (``daily_event_spine`` builds the grid
with ``sequence``+``explode`` — generated, never shuffled).

Both fills are single window passes per group:

- :func:`locf` — last observation carried forward:
  ``last(value) IGNORE NULLS`` over ``[unboundedPreceding, 0]``.
- :func:`interpolate_linear` — straight line between the nearest
  observed neighbors: ONE backward pass carries (prev value, prev
  position), ONE forward pass carries (next value, next position),
  then the weighted average is row-local arithmetic. No join, no
  explode — two sorts over one ``by``-partitioning.

At 100 TB both are linear: one shuffle on the group key, sorts
within partitions; the grid itself is rows × fill-rate and is
produced by ``sequence`` generation, so no operator here can
explode beyond the densified row count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def locf(
    df: DataFrame,
    by: str | Sequence[str],
    order: str,
    cols: Sequence[str],
    suffix: str = "_locf",
) -> DataFrame:
    """Carry each column's last non-null value forward within the
    group, ordered by ``order``. Adds ``<col><suffix>`` columns;
    rows before a group's first observation stay NULL (LOCF never
    extrapolates backward)."""
    by_cols = [by] if isinstance(by, str) else list(by)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(order).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(F.col(c), ignorenulls=True).over(w)
        )
    return out


def interpolate_linear(
    df: DataFrame,
    by: str | Sequence[str],
    order: str,
    col: str,
    pos: Column | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Linearly interpolate ``col``'s NULL rows between the nearest
    observed neighbors within the group (TimescaleDB
    ``interpolate`` semantics): observed rows keep their value;
    interior gaps get ``prev + (next - prev) * (t - t_prev) /
    (t_next - t_prev)``; leading/trailing gaps stay NULL (no
    extrapolation).

    ``pos`` is the numeric position expression used for distance
    math (defaults to the ``order`` column itself, which then must
    be numeric — pass e.g. ``F.unix_date(F.col("day"))`` for dates).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    pos = F.col(order) if pos is None else pos
    out_col = out_col or f"{col}_interp"
    obs_pos = F.when(F.col(col).isNotNull(), pos)
    w_back = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(order).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(order).asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(F.col(col), ignorenulls=True).over(w_back)
    prev_p = F.last(obs_pos, ignorenulls=True).over(w_back)
    next_v = F.first(F.col(col), ignorenulls=True).over(w_fwd)
    next_p = F.first(obs_pos, ignorenulls=True).over(w_fwd)
    interp = prev_v + (next_v - prev_v) * (pos - prev_p) / (
        next_p - prev_p
    )
    return df.withColumn(
        out_col,
        F.when(F.col(col).isNotNull(), F.col(col))
        .when(prev_v.isNull() | next_v.isNull(), F.lit(None))
        .otherwise(interp),
    )


def interpolate_linear_fixedpoint(
    df: DataFrame,
    by: str | Sequence[str],
    order: str,
    col: str,
    pos: Column | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """:func:`interpolate_linear` in EXACT fixed-point arithmetic:
    ``col`` must be a non-negative integral column (a value scaled
    by 10^k), and the interpolated output is the half-up-rounded
    rational ``(prev*(t_next-t) + next*(t-t_prev)) / (t_next-t_prev)``
    computed entirely in integer space — bit-identical across
    engines, immune to the float round-at-.5 boundary that makes
    ``round(double, k)`` engine-dependent (Spark HALF_UP on the
    decimal rendering vs DuckDB rounding the binary double: an
    interpolated midpoint like 5.21625 rounds differently). Use this
    whenever the filled series feeds an exactness gate; the float
    variant is fine for modeling features."""
    by_cols = [by] if isinstance(by, str) else list(by)
    pos = F.col(order) if pos is None else pos
    out_col = out_col or f"{col}_interp"
    obs_pos = F.when(F.col(col).isNotNull(), pos)
    w_back = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(order).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(order).asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(F.col(col), ignorenulls=True).over(w_back)
    prev_p = F.last(obs_pos, ignorenulls=True).over(w_back)
    next_v = F.first(F.col(col), ignorenulls=True).over(w_fwd)
    next_p = F.first(obs_pos, ignorenulls=True).over(w_fwd)
    num = prev_v * (next_p - pos) + next_v * (pos - prev_p)
    den = next_p - prev_p
    stamped = df.withColumn("__ts_num", num).withColumn("__ts_den", den)
    # half-up rational rounding via integral div (positive operands)
    half_up = F.expr("(2 * __ts_num + __ts_den) div (2 * __ts_den)")
    return stamped.withColumn(
        out_col,
        F.when(F.col(col).isNotNull(), F.col(col).cast("long"))
        .when(prev_v.isNull() | next_v.isNull(), F.lit(None))
        .otherwise(half_up),
    ).drop("__ts_num", "__ts_den")

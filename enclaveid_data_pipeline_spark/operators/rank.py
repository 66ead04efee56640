"""Bucketed global-order primitives: exact global row numbers,
percent ranks, and running sums without a single-task WindowExec.

An unpartitioned window (``Window.orderBy(...)``) plans as ONE task
holding the entire sorted input — Spark even warns (``No Partition
Defined for Window operation``).  Correct at eval scale, fatal at
100 TB: the whole corpus funnels through one executor thread.

The rewrite here is the textbook two-pass range rank:

1. bucket every row with a caller-supplied expression that is
   **monotone non-decreasing along the target order** (every row of
   bucket *b* precedes every row of bucket *b+1* in the total
   order — e.g. ``floor(score * k)`` for ``ORDER BY score``);
2. aggregate per-bucket counts / sums (tiny: one row per bucket);
3. turn those into exclusive prefix offsets with a theta-join
   prefix sum over the BUCKET TABLE only (bounded by construction,
   so no window of any kind touches unbounded data);
4. broadcast the offsets back and run the heavy window partitioned
   by bucket — parallelism = number of buckets.

Results are exact and identical to the single-window form whenever
the total order is unique (every call site appends an id tiebreak);
with ties, within-tie attribution follows the bucket-local order
exactly as the global window's would.

Sizing: pick enough buckets to cover cluster parallelism (64–1024);
the offsets theta-join materializes ≤ buckets² pairs, so stay at or
under ~4096 buckets (16 M tiny rows) — far above any real cluster's
task count per stage.

Order keys and bucket expressions must be non-null: a null bucket
drops the row at the offsets join (nulls never equi-join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_B = "__gbucket"
_OFF = "__goffset"
_N = "__gtotal"


def monotone_bucket(col: Column, lo: float, hi: float, n: int = 64) -> Column:
    """Equal-width bucket id over a known value range — monotone
    non-decreasing in ``col``, clamped so out-of-range values land in
    the edge buckets (keeping monotonicity, unlike a modulo)."""
    span = hi - lo
    raw = F.floor((col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(n))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")


def string_prefix_bucket(col: Column, chars: int = 2) -> Column:
    """Monotone bucket for an ASCII sort key: the first ``chars``
    character codes packed base-128.  Monotone w.r.t. lexicographic
    string order for 7-bit keys (the SNM keys here are ``[a-z0-9 ]``
    by construction); '' packs to 0 and sorts first, as it should."""
    b = F.lit(0).cast("long")
    for i in range(1, chars + 1):
        b = b * 128 + F.coalesce(
            F.ascii(F.substring(col, i, 1)), F.lit(0)
        ).cast("long")
    return b


def with_sampled_range_bucket(
    df: DataFrame, col: Column, n: int = 64, out: str = "__rbucket"
) -> DataFrame:
    """Data-adaptive monotone bucket for a NUMERIC sort key: learn
    n-quantile boundaries in-plan (``percentile_approx`` — one tiny
    aggregate, broadcast back), assign each row the count of
    boundaries ≤ its key.  Monotone by construction whatever the
    sketch returns, so the rank results stay exact even if the
    boundaries are approximate or shift with partitioning — only
    bucket BALANCE depends on sketch quality.  Use instead of
    :func:`monotone_bucket` when the key distribution is unknown or
    skewed; a dominant tie class still lands in one bucket (ties
    cannot split without breaking monotonicity) — low-cardinality
    keys should bucket on the key itself and accept per-key tasks.
    """
    bounds = df.select(col.cast("double").alias("__rk")).agg(
        F.percentile_approx(
            "__rk", [i / n for i in range(1, n)], 10_000
        ).alias("__rbounds")
    )
    return (
        df.withColumn("__rk", col.cast("double"))
        .join(F.broadcast(bounds))
        .withColumn(
            out,
            F.size(
                F.filter("__rbounds", lambda b: b <= F.col("__rk"))
            ).cast("long"),
        )
        .drop("__rk", "__rbounds")
    )


def _with_offsets(
    df: DataFrame, bucket: Column, per_bucket: Column
) -> DataFrame:
    """Attach ``_B`` (bucket id), ``_OFF`` (exclusive prefix total of
    ``per_bucket`` over all lower buckets) and ``_N`` (grand total).

    The prefix sum runs as a theta self-join over the one-row-per-
    bucket aggregate — bounded data, no unpartitioned window
    anywhere in the plan."""
    d = df.withColumn(_B, bucket.cast("long"))
    counts = d.groupBy(_B).agg(per_bucket.alias("__bt"))
    lower = counts.select(
        F.col(_B).alias("__lb"), F.col("__bt").alias("__lt")
    )
    offsets = (
        counts.join(lower, F.col("__lb") < F.col(_B), "left")
        .groupBy(_B, "__bt")
        .agg(F.coalesce(F.sum("__lt"), F.lit(0)).alias(_OFF))
        .drop("__bt")
    )
    total = counts.agg(F.sum("__bt").alias(_N))
    return d.join(F.broadcast(offsets), on=_B).join(F.broadcast(total))


def global_row_number(
    df: DataFrame,
    order: Sequence[Column],
    bucket: Column,
    out: str = "rn",
) -> DataFrame:
    """1-based global row number along ``order`` (identical to
    ``row_number() OVER (ORDER BY ...)``), computed with a window
    partitioned by ``bucket``."""
    d = _with_offsets(df, bucket, F.count(F.lit(1)))
    w = Window.partitionBy(_B).orderBy(*order)
    return (
        d.withColumn(
            out, (F.row_number().over(w) + F.col(_OFF)).cast("long")
        )
        .drop(_B, _OFF, _N)
    )


def global_percent_rank(
    df: DataFrame,
    order: Sequence[Column],
    bucket: Column,
    out: str = "pr",
) -> DataFrame:
    """``percent_rank() OVER (ORDER BY ...)`` for a UNIQUE total
    order (append an id tiebreak): (rn − 1) / (n − 1) in double — the
    same IEEE division Spark's PercentRank evaluates, so values are
    bit-identical to the unpartitioned window's."""
    d = _with_offsets(df, bucket, F.count(F.lit(1)))
    w = Window.partitionBy(_B).orderBy(*order)
    rn = F.row_number().over(w) + F.col(_OFF)
    pr = F.when(
        F.col(_N) > 1,
        (rn - 1).cast("double") / (F.col(_N) - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    return d.withColumn(out, pr).drop(_B, _OFF, _N)


def global_cumsum(
    df: DataFrame,
    value: Column,
    order: Sequence[Column],
    bucket: Column,
    out: str = "cum",
    inclusive: bool = True,
) -> DataFrame:
    """Running ``sum(value)`` along a unique total order — the
    admission-scan shape (token budgets, quota fills).  Frame is
    (unbounded preceding, current row) when ``inclusive`` else
    (unbounded preceding, −1), matching the window forms."""
    d = _with_offsets(df, bucket, F.sum(value))
    hi = Window.currentRow if inclusive else -1
    w = (
        Window.partitionBy(_B)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = F.coalesce(F.sum(value).over(w), F.lit(0))
    return d.withColumn(out, local + F.col(_OFF)).drop(_B, _OFF, _N)

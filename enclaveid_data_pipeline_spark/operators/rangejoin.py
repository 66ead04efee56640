"""Interval (range) join — point-in-interval matching.

The reference never joins on ranges (its per-day partition IS the
interval), but any session analytics engine needs point⋈interval:
assign events to session spans, clicks to campaigns, readings to
maintenance windows. Spark expresses the predicate as a non-equi
join condition; without help the planner can only do
BroadcastNestedLoopJoin (small side) or a cartesian — both collapse
at scale.

Scale path here: BUCKETIZE time. Every interval replicates to each
fixed-width bucket it overlaps; every point maps to its single
bucket; the join becomes an EQUI-join on (group, bucket) with the
range predicate as a residual filter. Candidates are bounded by
points-per-bucket × intervals-overlapping-that-bucket instead of
|points|×|intervals| per group, and the bucket key spreads one
group's work across tasks. Pick ``bucket_width`` ≈ median interval
length: wider buckets → fewer interval replicas but more false
candidates; narrower → the reverse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    group_cols: tuple[str, ...] = ("user_id",),
    bucket_width_us: int = 3_600_000_000,
    how: str = "inner",
) -> DataFrame:
    """Match each point to every [start, end] interval containing it
    (closed bounds), equi-joining on (group, time bucket).

    Timestamps are integer microseconds (exact; convert with
    ``F.unix_micros`` at the boundary). ``how="left"`` keeps
    unmatched points with NULL interval columns (the anti-join shape
    for orphan events). Interval replication is
    ``sequence(floor(start/W), floor(end/W))`` — one row per
    overlapped bucket; a point joins only its own bucket, so every
    (point, interval) pair meets at most once (the point's bucket is
    unique) and no dedup pass is needed.
    """
    b = F.lit(bucket_width_us)
    ivals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / b).cast("long"),
                (F.col(end_col) / b).cast("long"),
            )
        ),
    )
    pts = points.withColumn("__bucket", (F.col(point_ts) / b).cast("long"))
    cond = [
        *[pts[c] == ivals[c] for c in group_cols],
        pts["__bucket"] == ivals["__bucket"],
        pts[point_ts] >= ivals[start_col],
        pts[point_ts] <= ivals[end_col],
    ]
    joined = pts.join(ivals, cond, how)
    # drop the duplicated group/bucket columns from the interval side
    keep = [pts[c] for c in points.columns] + [
        ivals[c] for c in intervals.columns if c not in group_cols
    ]
    return joined.select(*keep)

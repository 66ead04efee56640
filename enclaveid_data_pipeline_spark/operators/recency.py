"""Recency split (SURVEY §2.2 P3, §2.4 A1 — the flagship ingest query).

Reference: assets/takeout.py:70-72 keeps rows whose timestamp is within
a calendar offset of the per-user MAX timestamp
(``filter(ts > ts.max().dt.offset_by("-3mo"))``). The reference does
this per user because each user is a separate process; here one
windowed expression covers all users in a single pass — the per-user
MAX is a window aggregate, so no self-join and no driver round trip
for the scalar (SURVEY §2.12 X7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutils import calendar_offset, parse_offset_string


def recency_split(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    offset: str = "-3mo",
) -> DataFrame:
    """Rows within ``offset`` of each user's latest timestamp.

    The offset string must be negative (the reference validates the
    sign, assets/takeout.py:54-55).

    Scale note: the window MAX is a partial-aggregated shuffle on
    ``user_col`` only (no sort needed for an unordered-frame MAX), and
    the filter happens before anything downstream — at 100 TB this is
    one shuffle of (user, max_ts) pairs, not an all-rows sort.
    """
    n, _unit = parse_offset_string(offset)
    if n >= 0:
        raise ValueError(f"recency offset must be negative, got {offset!r}")
    w = Window.partitionBy(user_col)
    ts = F.col(ts_col)
    cutoff = calendar_offset(F.max(ts).over(w), offset)
    return df.withColumn("__cutoff", cutoff).filter(ts > F.col("__cutoff")).drop(
        "__cutoff"
    )

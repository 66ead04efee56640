"""Custom stateful streaming operator (SURVEY §2.11 extension).

``F.session_window`` covers fixed/expression gaps, but its output is
an opaque window struct and its close rule is gap-only. This module
implements gap sessionization as an ``applyInPandasWithState``
operator with explicit per-user state, the extension point for close
rules the built-in cannot express (close-on-event-type, per-session
caps, value-dependent gaps). Semantics mirror the batch sessionizer
(operators/sessionize.py): a session breaks when the gap to the
previous event is strictly greater than ``gap_seconds``.

Out-of-order input across micro-batches is OBSERVABLE, not silent:
every closed session reports ``n_late`` — how many of its events
arrived in a later batch with a timestamp at or before the open
session's end at batch entry (``late_policy="error"`` fails the
query instead, for pipelines where cross-batch disorder means a
broken upstream). Within a batch events are sorted per user, so
``n_late`` counts genuine cross-batch disorder only.

Trailing open sessions flush through the first-class
``watermark_delay`` parameter (event-time timeout): when the
watermark passes ``session_end + gap``, the open session is emitted
and its state removed — no session is ever stuck in state on a quiet
key. Without a watermark the trailing session stays open (the
NoTimeout mode), which the tests exercise explicitly.

Scale notes: state is one open session per user — O(|users|) rows of
five scalars, hash-partitioned by user across executors; no
per-event state growth.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Closed-session output: timestamps as integer microseconds at the
#: operator boundary (exact; converted to timestamps by the wrapper).
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_late", T.LongType()),
    ]
)

#: Open-session state carried between micro-batches.
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_late", T.LongType()),
    ]
)

_COLS = [
    "user_id",
    "session_start_us",
    "session_end_us",
    "n_events",
    "total_value",
    "n_late",
]


def _make_session_fn(gap_us: int, late_policy: str, flush: bool):
    def close_sessions(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        if flush and state.hasTimedOut:
            start_us, end_us, n, v, n_late = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start_us, end_us, n, v, n_late)], columns=_COLS
            )
            return

        if state.exists:
            start_us, end_us, n, v, n_late = state.get
        else:
            start_us = end_us = None
            n, v, n_late = 0, 0.0, 0
        entry_end_us = end_us  # late = ts ≤ open-session end at entry

        closed: list[tuple[int, int, int, int, float, int]] = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts_us")
            for ts, val in zip(pdf["ts_us"].values, pdf["value"].values):
                ts = int(ts)
                if entry_end_us is not None and ts <= entry_end_us:
                    if late_policy == "error":
                        raise ValueError(
                            f"late cross-batch event for user {user_id}: "
                            f"ts_us={ts} <= open session end "
                            f"{entry_end_us} (late_policy='error')"
                        )
                    n_late += 1
                if start_us is None:
                    start_us, end_us, n, v = ts, ts, 1, float(val)
                elif ts - end_us > gap_us:
                    closed.append((user_id, start_us, end_us, n, v, n_late))
                    start_us, end_us, n, v, n_late = ts, ts, 1, float(val), 0
                else:
                    end_us, n, v = max(end_us, ts), n + 1, v + float(val)

        if start_us is not None:
            state.update((start_us, end_us, n, v, n_late))
            if flush:
                # flush when the watermark passes end + gap; clamp
                # above the current watermark (Spark rejects timeouts
                # at/before it)
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max((end_us + gap_us) // 1000, wm_ms + 1)
                )
        if closed:
            yield pd.DataFrame(closed, columns=_COLS)

    return close_sessions


def stateful_sessionize(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
    late_policy: str = "count",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Emit CLOSED sessions (start/end/count/value-sum + ``n_late``
    out-of-order diagnostic) per user.

    A session closes when a later event for the same user arrives
    more than ``gap_seconds`` after it ends. With ``watermark_delay``
    (e.g. ``"1 hour"``) the stream gets a watermark and open sessions
    ALSO flush once the watermark passes ``session_end + gap`` —
    event-time-complete output. Without it, each user's trailing
    session stays in state until more events arrive.

    ``late_policy``: ``"count"`` (default) surfaces cross-batch
    out-of-order events in the ``n_late`` column; ``"error"`` fails
    the query on the first one.
    """
    if late_policy not in ("count", "error"):
        raise ValueError(f"late_policy must be count|error, got {late_policy!r}")
    prepared = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("__ts"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )
    if watermark_delay is not None:
        # the watermarked TIMESTAMP column must survive into the
        # stateful op's input — projecting it away detaches the
        # watermark and EventTimeTimeout refuses to plan
        prepared = prepared.withWatermark("__ts", watermark_delay)
    prepared = prepared.withColumn(
        "ts_us", F.unix_micros(F.col("__ts").cast("timestamp"))
    )
    out = prepared.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(
            int(gap_seconds * 1_000_000),
            late_policy,
            flush=watermark_delay is not None,
        ),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if watermark_delay is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
    return out.select(
        "user_id",
        F.timestamp_micros(F.col("session_start_us")).alias("session_start"),
        F.timestamp_micros(F.col("session_end_us")).alias("session_end"),
        "n_events",
        F.round("total_value", 4).alias("total_value"),
        "n_late",
    )

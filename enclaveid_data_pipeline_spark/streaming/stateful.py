"""Custom stateful streaming operator (SURVEY §2.11 extension).

``F.session_window`` covers fixed/expression gaps, but its output is
an opaque window struct and its close rule is gap-only. This module
implements gap sessionization as an ``applyInPandasWithState``
operator with explicit per-user state, the extension point for close
rules the built-in cannot express (close-on-event-type, per-session
caps, value-dependent gaps). Semantics mirror the batch sessionizer
(operators/sessionize.py): a session breaks when the gap to the
previous event is strictly greater than ``gap_seconds``.

Scale notes: state is one open session per user — O(|users|) rows of
four scalars, hash-partitioned by user across executors; no
per-event state growth. Events inside one micro-batch are sorted
per user in-memory (bounded by batch size); cross-batch order relies
on source ordering per key, the standard caveat for custom stateful
ops (use a watermarked pre-sort upstream when sources interleave).
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
    ]
)

#: Open-session state carried between micro-batches.
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _make_session_fn(gap_us: int):
    def close_sessions(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, end_us, n, v = state.get
        else:
            start_us = end_us = None
            n, v = 0, 0.0

        closed: list[tuple[int, int, int, int, float]] = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts_us")
            for ts, val in zip(pdf["ts_us"].values, pdf["value"].values):
                ts = int(ts)
                if start_us is None:
                    start_us, end_us, n, v = ts, ts, 1, float(val)
                elif ts - end_us > gap_us:
                    closed.append((user_id, start_us, end_us, n, v))
                    start_us, end_us, n, v = ts, ts, 1, float(val)
                else:
                    end_us, n, v = max(end_us, ts), n + 1, v + float(val)

        if start_us is not None:
            state.update((start_us, end_us, n, v))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start_us",
                    "session_end_us",
                    "n_events",
                    "total_value",
                ],
            )

    return close_sessions


def stateful_sessionize(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Emit CLOSED sessions (start/end/count/value-sum) per user.

    A session closes when a later event for the same user arrives
    more than ``gap_seconds`` after it ends; the trailing open
    session per user stays in state (production: pair with an
    event-time timeout to flush; tests compare against the batch
    sessionizer minus each user's final session).
    """
    prepared = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )
    out = prepared.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(int(gap_seconds * 1_000_000)),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.select(
        "user_id",
        F.timestamp_micros(F.col("session_start_us")).alias("session_start"),
        F.timestamp_micros(F.col("session_end_us")).alias("session_end"),
        "n_events",
        F.round("total_value", 4).alias("total_value"),
    )

"""Sessionization on the ``transformWithStateInPandas`` API
(SURVEY §2.11 extension, beside ``streaming/stateful.py``).

Spark 4 ships a second-generation arbitrary-stateful API —
``transformWithStateInPandas`` (SPARK-40434 / the "transformWithState"
operator) — that supersedes ``applyInPandasWithState``: typed state
variables (value/list/map) instead of one state tuple, first-class
event-time TIMERS instead of a single timeout, state TTL, and initial
state bootstrap. This module re-expresses the gap sessionizer on that
API with semantics BYTE-IDENTICAL to
``streaming.stateful.stateful_sessionize`` (the A/B parity test pins
them), so a user can choose the API generation per deployment:

- ``applyInPandasWithState``: HDFS-backed state store is enough;
  Spark 3.4+ compatible shape.
- ``transformWithStateInPandas`` (this module): requires the RocksDB
  state store provider (Spark enforces it), in exchange for timers
  that survive independently of input (the flush path here), per-key
  timer lists, and incremental state-var evolution.

Shared semantics (see ``streaming/stateful.py`` for the derivation of
the vectorized break-scan): a session breaks when the gap to the
previous event is strictly greater than ``gap_seconds``; cross-batch
disorder is surfaced per closed session as ``n_late`` (or fails the
query under ``late_policy="error"``); with ``watermark_delay`` an
open session flushes once the watermark passes ``session_end + gap``
— here via a real registered timer rather than a GroupState timeout.

Scale notes: state is one 5-scalar value-state row plus at most one
timer per user, hash-partitioned by user; no per-event growth. The
vectorized batch path is the same argsort + break-scan +
``np.add.reduceat`` as the GroupState form — the two operators differ
only in the state plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_DDL = (
    "user_id long, session_start_us long, session_end_us long, "
    "n_events long, total_value double, n_late long"
)
_STATE_DDL = (
    "start_us long, end_us long, n_events long, total_value double, "
    "n_late long"
)
_COLS = [
    "user_id",
    "session_start_us",
    "session_end_us",
    "n_events",
    "total_value",
    "n_late",
]

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True iff ``transformWithStateInPandas`` can actually run here.

    The operator's Python<->JVM state protocol serializes state-var
    traffic with ``google.protobuf``; without it every task dies with
    "TransformWithStateInPySpark driver worker exited unexpectedly".
    This is a runtime dependency of PySpark's stateful-processor
    wire format, not of this module's logic.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False
    return True


def require_tws() -> None:
    """Raise a precise error when the tws runtime deps are missing."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf "
            "(PySpark's stateful-processor state protocol); it is not "
            "installed. Use streaming.stateful.stateful_sessionize or "
            "streaming.sessions.session_window instead — both cover "
            "the same gap-sessionization semantics."
        )


def _make_processor(gap_us: int, late_policy: str, flush: bool):
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    import numpy as np

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._open = handle.getValueState("open_session", _STATE_DDL)

        def close(self) -> None:
            pass

        def _arm_timer(self, end_us: int, timer_values: TimerValues) -> None:
            """One live timer per key at (end + gap), clamped above the
            current watermark (a timer at/before it would never be
            meaningfully pending)."""
            want_ms = max(
                (end_us + gap_us) // 1000,
                timer_values.getCurrentWatermarkInMs() + 1,
            )
            for t in list(self._handle.listTimers()):
                if t != want_ms:
                    self._handle.deleteTimer(t)
            self._handle.registerTimer(want_ms)

        def handleExpiredTimer(
            self,
            key: Any,
            timer_values: TimerValues,
            expired_timer_info: ExpiredTimerInfo,
        ) -> Iterator[pd.DataFrame]:
            got = self._open.get()
            if got is None:
                return
            start_us, end_us, n, v, n_late = got
            # stale timer from a since-extended session: the re-armed
            # one is still pending, emit nothing
            if (end_us + gap_us) // 1000 > expired_timer_info.getExpiryTimeInMs():
                return
            self._open.clear()
            (user_id,) = key
            yield pd.DataFrame(
                [(user_id, start_us, end_us, n, v, n_late)], columns=_COLS
            )

        def handleInputRows(
            self,
            key: Any,
            rows: Iterator[pd.DataFrame],
            timer_values: TimerValues,
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            got = self._open.get()
            if got is not None:
                s_start, s_end, s_n, s_v, s_late = got
            else:
                s_start = None
                s_end = s_n = s_late = 0
                s_v = 0.0

            chunks = [p for p in rows if len(p)]
            if not chunks:
                return
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            ts_raw = pdf["ts_us"].to_numpy(np.int64)
            order = np.argsort(ts_raw, kind="stable")
            ts = ts_raw[order]
            vals = pdf["value"].to_numpy(np.float64)[order]
            m = len(ts)

            head_late = 0
            if got is not None:
                head_late = int(np.searchsorted(ts, s_end, side="right"))
                if head_late and late_policy == "error":
                    raise ValueError(
                        f"late cross-batch event for user {user_id}: "
                        f"ts_us={int(ts[0])} <= open session end "
                        f"{s_end} (late_policy='error')"
                    )

            brk = np.zeros(m, dtype=bool)
            if got is not None:
                brk[0] = (ts[0] - s_end) > gap_us
                if m > 1:
                    brk[1:] = (ts[1:] - np.maximum(ts[:-1], s_end)) > gap_us
            elif m > 1:
                brk[1:] = (ts[1:] - ts[:-1]) > gap_us

            seg_starts = np.unique(np.concatenate(([0], np.flatnonzero(brk))))
            seg_last = np.concatenate((seg_starts[1:] - 1, [m - 1]))

            starts = ts[seg_starts]
            ends = ts[seg_last]
            ns = np.diff(np.concatenate((seg_starts, [m])))
            vs = np.add.reduceat(vals, seg_starts)
            lates = np.zeros(len(ns), dtype=np.int64)

            state_row = None
            if got is not None:
                if brk[0]:
                    state_row = (s_start, s_end, s_n, s_v, s_late)
                else:
                    starts = starts.copy()
                    starts[0] = s_start
                    ends = ends.copy()
                    ends[0] = max(int(ends[0]), s_end)
                    ns = ns.copy()
                    ns[0] += s_n
                    vs = vs.copy()
                    vs[0] += s_v
                    lates[0] = s_late + head_late

            last = len(ns) - 1
            self._open.update(
                (int(starts[last]), int(ends[last]), int(ns[last]),
                 float(vs[last]), int(lates[last]))
            )
            if flush:
                self._arm_timer(int(ends[last]), timer_values)
            if last > 0 or state_row is not None:
                out = {
                    "user_id": np.full(last, user_id, dtype=np.int64),
                    "session_start_us": starts[:last],
                    "session_end_us": ends[:last],
                    "n_events": ns[:last],
                    "total_value": vs[:last],
                    "n_late": lates[:last],
                }
                frame = pd.DataFrame(out, columns=_COLS)
                if state_row is not None:
                    frame = pd.concat(
                        [
                            pd.DataFrame(
                                [(user_id, *state_row)], columns=_COLS
                            ),
                            frame,
                        ],
                        ignore_index=True,
                    )
                yield frame

    return SessionProcessor()


def tws_sessionize(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
    late_policy: str = "count",
    watermark_delay: str | None = None,
) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    :func:`~..streaming.stateful.stateful_sessionize` — same closed-
    session output (start/end/count/value-sum + ``n_late``), same gap
    and late semantics, timer-driven flush.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...RocksDBStateStoreProvider``) — Spark rejects the operator on
    the default HDFS-backed provider. Set it before starting the
    query; :data:`ROCKSDB_PROVIDER` holds the class name.
    """
    if late_policy not in ("count", "error"):
        raise ValueError(f"late_policy must be count|error, got {late_policy!r}")
    prepared = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("__ts"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )
    if watermark_delay is not None:
        prepared = prepared.withWatermark("__ts", watermark_delay)
    prepared = prepared.withColumn(
        "ts_us", F.unix_micros(F.col("__ts").cast("timestamp"))
    )
    out = prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_processor(
            int(gap_seconds * 1_000_000),
            late_policy,
            flush=watermark_delay is not None,
        ),
        outputStructType=_OUT_DDL,
        outputMode="append",
        timeMode="eventTime" if watermark_delay is not None else "none",
    )
    return out.select(
        "user_id",
        F.timestamp_micros(F.col("session_start_us")).alias("session_start"),
        F.timestamp_micros(F.col("session_end_us")).alias("session_end"),
        "n_events",
        F.round("total_value", 4).alias("total_value"),
        "n_late",
    )

"""Stateful streaming sequence patterns — the escalation path the
batch operator names (operators/seqpattern: a group whose history
cannot collapse to one string).

Same semantics as the batch ``per_anchor=True`` form (every row may
start a match; MATCH_RECOGNIZE ``AFTER MATCH SKIP TO NEXT ROW``), but
over an unbounded stream with BOUNDED state: the caller declares
``max_match_len`` — the longest row-span a match may cover (for
``v.{0,2}c.{0,2}p`` that is 7) — and the operator keeps only the
undecided suffix of each key's symbol stream. An anchor finalizes as
soon as its outcome is knowable:

- MATCH the moment the regex matches the available suffix (a
  per-anchor existence hit can never be retracted by later rows;
  matches emit immediately, even while an earlier anchor is still
  undecided — a per-position emitted flag prevents re-emission);
- NO-MATCH once ``max_match_len`` symbols follow it unmatched.

State trims to the first undecided anchor, which by definition has
fewer than ``max_match_len`` symbols after it — so each key holds
< ``max_match_len`` symbols regardless of history length. That
bounded-length guard is what the batch form's ``max_len`` error
message points at.

With ``watermark_delay`` the operator flushes on event-time timeout:
once the watermark passes an undecided anchor's event time, the
anchor is finalized against the symbols present and state is removed
— quiet keys hold no state forever. Note the semantic trade vs the
batch form: adjacency patterns have no time bound, so the flush
implicitly asserts "a match completes within the watermark delay";
a pipeline whose patterns may span longer real-time gaps should run
without a watermark (NoTimeout) and accept undecided tails waiting
in state. Both modes are exercised in tests.

Out-of-order input WITHIN a micro-batch is sorted per key before
appending; cross-batch disorder cannot be re-sequenced (earlier
symbols are already finalized) and is counted per emitted row as
``n_late`` — observable, like streaming/stateful.py, not silent.
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Mapping
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: One output row per matched anchor.
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("matched_at_us", T.LongType()),
        T.StructField("n_late", T.LongType()),
    ]
)

#: Undecided suffix: aligned symbol string + event-time array +
#: already-emitted flags (a matched anchor emits the moment it
#: matches, even while an EARLIER anchor is still undecided — the
#: flag stops re-emission when the kept suffix is re-scanned), plus
#: the last seen event time (late detection across batches).
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("syms", T.StringType()),
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("emitted", T.ArrayType(T.BooleanType())),
        T.StructField("max_seen_us", T.LongType()),
    ]
)

_COLS = ["user_id", "matched_at_us", "n_late"]


def _scan(
    rx: re.Pattern,
    syms: str,
    ts: list[int],
    emitted: list[bool],
    max_match_len: int,
    drain: bool,
) -> tuple[list[int], str, list[int], list[bool]]:
    """Emit every not-yet-emitted anchor that matches (left-anchored
    at its position — per-anchor semantics; a match can never be
    retracted by later rows), then trim the decided prefix: a
    position is decided once it has emitted OR ``max_match_len``
    symbols follow it unmatched (``drain=True`` decides everything).
    The first undecided position has < max_match_len symbols after
    it, so the kept suffix — state — is < max_match_len symbols."""
    n = len(syms)
    emitted = list(emitted)
    hits: list[int] = []
    for i in range(n):
        if not emitted[i] and rx.match(syms, i) is not None:
            hits.append(ts[i])
            emitted[i] = True
    trim = n
    if not drain:
        for i in range(n):
            if not emitted[i] and n - i < max_match_len:
                trim = i
                break
    return hits, syms[trim:], ts[trim:], emitted[trim:]


def _make_pattern_fn(
    pattern: str, max_match_len: int, flush: bool
):
    rx = re.compile(pattern)

    def match_fn(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        if flush and state.hasTimedOut:
            syms, ts_us, emitted, _max_seen = state.get
            state.remove()
            hits, _, _, _ = _scan(
                rx, syms, list(ts_us), list(emitted), max_match_len,
                drain=True,
            )
            if hits:
                yield pd.DataFrame(
                    [(user_id, h, 0) for h in hits], columns=_COLS
                )
            return

        if state.exists:
            syms, ts_list, em_list, max_seen = state.get
            ts_us, emitted = list(ts_list), list(em_list)
        else:
            syms, ts_us, emitted, max_seen = "", [], [], None

        n_late = 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts_us")
            for t, s in zip(pdf["ts_us"].values, pdf["sym"].values):
                t = int(t)
                if max_seen is not None and t <= max_seen:
                    n_late += 1
                syms += s
                ts_us.append(t)
                emitted.append(False)
                max_seen = t if max_seen is None else max(max_seen, t)

        hits, syms, ts_us, emitted = _scan(
            rx, syms, ts_us, emitted, max_match_len, drain=False
        )

        if syms or not flush:
            state.update((syms, ts_us, emitted, max_seen))
            if flush:
                wm_ms = state.getCurrentWatermarkMs()
                flush_at_us = (
                    ts_us[0] if ts_us else (max_seen or 0)
                )
                state.setTimeoutTimestamp(
                    max(flush_at_us // 1000, wm_ms + 1)
                )
        elif state.exists:
            state.remove()

        if hits:
            yield pd.DataFrame(
                [(user_id, h, n_late) for h in hits], columns=_COLS
            )

    return match_fn


def stateful_match_pattern(
    events: DataFrame,
    pattern: str,
    symbols: Mapping[str, str],
    max_match_len: int,
    default_symbol: str = "x",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    watermark_delay: str | None = None,
) -> DataFrame:
    """Emit one row per matched anchor (``user_id``, ``matched_at``,
    ``n_late``) as matches become decidable; see module doc for the
    state bound and flush semantics.

    ``pattern`` is matched LEFT-ANCHORED at each row's symbol (the
    batch twin's lookahead form); ``max_match_len`` must be an upper
    bound on the row-span of any match — for gap-bounded patterns the
    sum of the fixed symbols and gap maxima. A pattern that can match
    arbitrarily long spans (unbounded ``.*``) is rejected: it would
    make state unbounded, which is the exact failure this operator
    exists to prevent.
    """
    if max_match_len < 1:
        raise ValueError(f"max_match_len must be >= 1, got {max_match_len}")
    if ".*" in pattern or ".+" in pattern:
        raise ValueError(
            "unbounded quantifiers make state unbounded; use bounded "
            "gaps like .{0,k}"
        )
    from ..operators.seqpattern import symbolize

    sym = symbolize(events, type_col, symbols, default=default_symbol)
    prepared = sym.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("__ts"),
        F.col("sym"),
    )
    if watermark_delay is not None:
        prepared = prepared.withWatermark("__ts", watermark_delay)
    prepared = prepared.withColumn(
        "ts_us", F.unix_micros(F.col("__ts").cast("timestamp"))
    )
    out = prepared.groupBy("user_id").applyInPandasWithState(
        _make_pattern_fn(
            pattern, max_match_len, flush=watermark_delay is not None
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
        F.timestamp_micros(F.col("matched_at_us")).alias("matched_at"),
        "n_late",
    )

"""Time/date expression helpers (SURVEY §2.8 F1-F5, §7.3 hard part 3).

The reference leans on Polars ``offset_by("-3mo"/"-15d")`` (calendar
semantics, assets/takeout.py:71) and Postgres ``EXTRACT('epoch' ...)``
(assets/recent_history.py:270). Spark equivalents must keep the
month-vs-day distinction: ``add_months`` for month offsets (calendar
arithmetic), interval subtraction for day/hour offsets.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_OFFSET_RE = re.compile(r"^(-?\d+)(mo|d|h|m|s|w|y)$")

#: unit -> seconds, for fixed-width units only (months/years are calendar).
_FIXED_SECONDS = {"d": 86400, "h": 3600, "m": 60, "s": 1, "w": 7 * 86400}


def parse_offset_string(offset: str) -> tuple[int, str]:
    """Parse a Polars-style offset string (``-3mo``, ``-15d``, ``2h``).

    Reference semantics: assets/takeout.py:16-33 configures the recency
    threshold as such a string and validates it is negative
    (assets/takeout.py:54-55).
    """
    m = _OFFSET_RE.match(offset.strip())
    if not m:
        raise ValueError(f"unsupported offset string: {offset!r}")
    return int(m.group(1)), m.group(2)


def calendar_offset(ts: Column, offset: str) -> Column:
    """``ts`` shifted by a Polars-style offset string.

    ``mo``/``y`` are calendar-aware (``add_months``); fixed-width units
    become interval arithmetic. Mirrors ``dt.offset_by`` semantics the
    reference relies on for the recency split (assets/takeout.py:70-72).
    """
    n, unit = parse_offset_string(offset)
    if unit == "mo":
        return F.timestamp_add("MONTH", F.lit(n), ts)
    if unit == "y":
        return F.timestamp_add("YEAR", F.lit(n), ts)
    seconds = n * _FIXED_SECONDS[unit]
    return F.timestamp_add("SECOND", F.lit(seconds), ts)


def epoch_micros(ts: Column | str) -> Column:
    """Microseconds since the epoch for BOTH timestamp flavors.

    ``unix_micros`` rejects TIMESTAMP_NTZ outright, and parquet
    sources with ``isAdjustedToUTC=false`` (this repo's ``events``
    table) surface as NTZ — so every epoch conversion goes through
    this cast. The session pins ``spark.sql.session.timeZone=UTC``
    (session.py), which makes the NTZ→LTZ cast a micros-identity and
    keeps parity with DuckDB's ``epoch_us`` on naive timestamps.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(c.cast("timestamp"))


def ntz_micros(c: Column) -> Column:
    """Microseconds since the epoch of a TIMESTAMP_NTZ value treated
    as UTC — computed by FIELD ARITHMETIC only, so the result is
    independent of ``spark.sql.session.timeZone``.

    The cast-through-TIMESTAMP shortcut (``epoch_micros``) is a
    micros-identity only because the engine session pins UTC; under a
    DST session zone two NTZ values straddling a transition would get
    gaps off by the DST delta (round-6 advice on the as-of join's
    nearest/tolerance math). Here nothing consults a zone: days come
    from the date fields (``unix_date`` of the NTZ's date part is
    pure field truncation), seconds from hour/minute, and the
    fractional second from ``date_part('SECOND')`` (DECIMAL(8,6),
    micros included).
    """
    days = F.unix_date(c.cast("date")).cast("long")
    secs = F.hour(c).cast("long") * 3600 + F.minute(c).cast("long") * 60
    frac = F.date_part(F.lit("SECOND"), c)
    return (
        days * F.lit(86_400_000_000)
        + secs * F.lit(1_000_000)
        + (frac * 1_000_000).cast("long")
    )


def epoch_seconds(ts: Column) -> Column:
    """F5: ``EXTRACT('epoch' FROM ts)`` with fractional seconds."""
    return epoch_micros(ts).cast("double") / F.lit(1_000_000.0)


def hhmm_to_timestamp(date_col: Column, hhmm: Column) -> Column:
    """F2/F4: ``(date || ' ' || 'HH:mm')::timestamp`` — the timestamp
    twin of the reference's TimeType columns (SURVEY §1.2)."""
    return F.to_timestamp(
        F.concat_ws(" ", date_col.cast("string"), hhmm), "yyyy-MM-dd HH:mm"
    )

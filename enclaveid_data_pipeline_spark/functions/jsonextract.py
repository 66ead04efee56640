"""JSON extraction from free text (SURVEY §2.8 F9/F10, §2.2 P10).

The reference's ``extract_json`` scans an LLM response for the first
balanced ``{...}``/``[...]`` span, parses it, and repeats on the
remainder (utils/recent_history_utils.py:25-65) — a stack-based scan
that SQL regex cannot express. Engine treatment: keep the Python part
microscopic (text → array of candidate JSON strings) as a vectorized
pandas UDF, then parse natively with ``from_json`` + explode so schema
enforcement and downstream filtering stay JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OPEN_TO_CLOSE = {"{": "}", "[": "]"}


def extract_json_candidates(text: str | None) -> list[str]:
    """Pure-Python balanced-bracket scan (string-literal aware).

    Returns every top-level ``{...}`` / ``[...]`` span in order.
    Mirrors the reference's repeated first-match scan, tolerating
    multiple JSON objects per response.
    """
    if not text:
        return []
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in _OPEN_TO_CLOSE:
            depth = 0
            in_str = False
            esc = False
            j = i
            while j < n:
                c = text[j]
                if in_str:
                    if esc:
                        esc = False
                    elif c == "\\":
                        esc = True
                    elif c == '"':
                        in_str = False
                elif c == '"':
                    in_str = True
                elif c in "{[":
                    depth += 1
                elif c in "}]":
                    depth -= 1
                    if depth == 0:
                        out.append(text[i : j + 1])
                        i = j
                        break
                j += 1
        i += 1
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def json_candidates_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched wrapper over :func:`extract_json_candidates` —
    the only Python on the path; parsing stays in ``from_json``."""
    return texts.map(extract_json_candidates)


def parse_json_spans(col: Column, schema: str | T.StructType) -> Column:
    """F10: strict-schema parse of one candidate span.

    ``from_json`` yields NULL for non-conforming spans; downstream
    filters drop them (P10's dict-shape validation becomes
    null-checking the struct and its required fields).
    """
    return F.from_json(col, schema)


#: Schema of the reference's per-session LLM output
#: (utils/recent_history_utils.py:155-163).
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("time_start", T.StringType()),
        T.StructField("time_end", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("interests", T.ArrayType(T.StringType())),
    ]
)

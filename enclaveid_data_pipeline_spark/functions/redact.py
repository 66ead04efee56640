"""PII redaction for training corpora (training-data extension).

Emails, URLs, and phone numbers are scrubbed with conservative
regexes before text enters a training set — the standard
pre-tokenization hygiene pass. Patterns are chosen to parse
IDENTICALLY under Java regex (Spark) and RE2 (DuckDB/most scanners):
character classes, bounded repetition, no backrefs/lookaround — so
the oracle replays the exact scrub and the same patterns port to
other engines.

All expressions are native ``regexp_replace`` / ``regexp_extract_all``
— JVM-side, whole-stage-codegen, no UDFs; the scrub is a row-local
projection (zero shuffle) that composes with any downstream operator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Pattern table: (name, regex, replacement token). Order matters —
#: URLs scrub before emails so ``https://user@host`` credentials
#: don't leave a dangling match.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
)


def scrub_pii(text: Column) -> Column:
    """Replace every PII match with its type token, in table order."""
    out = text
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type match counts (BEFORE scrubbing), keyed ``n_<type>``.

    Counted on the same progressively-scrubbed text the replacement
    pass sees, so overlapping patterns (a URL containing an ``@``)
    are attributed to exactly one type, matching the scrub.
    """
    counts: dict[str, Column] = {}
    cur = text
    for name, pattern, token in PII_PATTERNS:
        counts[f"n_{name}"] = F.size(
            F.regexp_extract_all(cur, F.lit(pattern), F.lit(0))
        ).cast("long")
        cur = F.regexp_replace(cur, pattern, token)
    return counts

"""Text-analysis expressions for training-data pipelines.

Language-ID (marker-count heuristic), quality scoring
(length/stopword/punctuation ratios), token counting (whitespace +
regex "BPE-ish" word/punct split), and document fingerprinting
(min-hash-of-shingles, a winnowing-lite rolling fingerprint).

All pure Catalyst expressions (no UDFs); every formula uses
integer-derived doubles and fixed expression order, so results are
bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny stopword set for ratio features (engine-portable literal).
STOPWORDS = ("the", "a", "of", "and", "to")

#: (lang, marker) — substring markers for the heuristic language ID.
LANG_MARKERS = (
    ("en", " the "),
    ("de", " der "),
    ("fr", " le "),
    ("es", " el "),
    ("zh", "的"),
)

#: word-or-punctuation token regex ("BPE-ish" pre-tokenizer split).
TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(text, " "))


def regex_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(TOKEN_RE))


def substring_count(text: Column, marker: str) -> Column:
    """Occurrences of ``marker`` via length arithmetic — exact integer
    math, identical in any SQL engine."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit("")))
    ) / F.lit(len(marker))


def stopword_ratio(tokens: Column) -> Column:
    n_stop = F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))
    return n_stop.cast("double") / F.size(tokens)


def punct_ratio(text: Column) -> Column:
    return (
        F.regexp_count(text, F.lit(r"[^A-Za-z0-9_\s]")).cast("double")
        / F.length(text)
    )


def mean_word_len(text: Column, tokens: Column) -> Column:
    """Mean token length for single-space-joined text via length
    arithmetic: ``(len(text) - (n-1)) / n`` — exact integer inputs,
    no per-token traversal, identical in any engine."""
    n = F.size(tokens)
    return (F.length(text) - n + F.lit(1)).cast("double") / n


def distinct_token_ratio(tokens: Column) -> Column:
    """|distinct tokens| / |tokens| — the cheap intra-document
    repetition signal (low ratio ⇒ templated / looping text)."""
    return F.size(F.array_distinct(tokens)).cast("double") / F.size(tokens)


def stopword_hits(tokens: Column) -> Column:
    """Count of stop-word tokens (with multiplicity)."""
    return F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))


def quality_score(text: Column, tokens: Column) -> Column:
    """Composite quality in [0,1]: length saturation + stopword
    presence + punctuation sanity. Weights are arbitrary but fixed;
    the point is the *shape* (cheap, monotone, distributable)."""
    len_component = F.least(F.lit(1.0), F.size(tokens).cast("double") / F.lit(100.0))
    return F.round(
        F.lit(0.4) * len_component
        + F.lit(0.4) * stopword_ratio(tokens)
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio(text)),
        6,
    )


def lang_guess(text: Column) -> Column:
    """Marker-count argmax with first-listed tie-break (CASE chain —
    deterministic and identical in the oracle SQL)."""
    counts = [substring_count(text, m) for _, m in LANG_MARKERS]
    best = F.greatest(*counts)
    expr = F.lit("unknown")
    # build CASE from last to first so earlier langs win ties
    for (lang, _), cnt in reversed(list(zip(LANG_MARKERS, counts))):
        expr = F.when((cnt == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(shingles: Column) -> Column:
    """Rolling-hash document fingerprint: lexicographic min of
    md5(shingle) — robust to local edits outside the minimizing
    window; NULL for docs with no shingle."""
    return F.array_min(F.transform(shingles, F.md5))


def repetition_ratio(shingles: Column) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier
    n-gram in the SAME document — the Gopher/DCLM-style intra-doc
    repetition rule (templated or looping text scores high). 0 when
    every n-gram is unique; row-local, no shuffle."""
    total = F.size(shingles)
    distinct = F.size(F.array_distinct(shingles))
    return F.when(total > 0, (total - distinct).cast("double") / total).otherwise(
        F.lit(0.0)
    )

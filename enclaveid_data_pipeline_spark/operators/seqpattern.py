"""Regex-over-rows sequence patterns (MATCH_RECOGNIZE-lite).

Generalizes the strictly-consecutive lead-window case
(``queries.session_queries.sequence_pattern_vcp``) to arbitrary
regular patterns with bounded gaps: each group's ordered events
collapse to ONE symbol string (one char per event), and the pattern
is a plain Java regex over that string — ``v.{0,2}c.{0,2}p`` is
"view, then click within ≤2 intervening events, then purchase within
≤2 more". No reference query needs this (the reference has no
sequence operator); it exists because the lead-window form cannot
express variable-length gaps, alternation, or repetition.

Execution shape: symbolize (row-local CASE) → one groupBy collecting
``struct(order_cols..., sym)`` → ``array_sort`` (struct ordering =
lexicographic on fields, exactly the window order) → ``array_join``
→ native ``regexp_count``/``regexp_instr``. One shuffle, all JVM;
the per-group string is the only non-streaming artifact, so the
operator guards group length explicitly (``max_len``) — a group
whose history cannot fit a string belongs to the stateful escalation
(streaming ``applyInPandasWithState`` keeping a bounded suffix of
the symbol stream), not to a bigger collect.

Match semantics, chosen per call:

- ``per_anchor=False`` — non-overlapping leftmost matches
  (MATCH_RECOGNIZE ``AFTER MATCH SKIP PAST LAST ROW``): the regex
  engine's native count.
- ``per_anchor=True`` — every row may start a match
  (``AFTER MATCH SKIP TO NEXT ROW``): the pattern is wrapped in a
  zero-width lookahead ``(?=...)`` so the scan advances one symbol
  per hit. This is the form a window/EXISTS SQL oracle can verify
  independently (each anchor row is a match iff a qualifying
  suffix exists).

100 TB posture: the shuffle carries (group, order, one char) — the
narrowest possible representation of the history; string length is
group size, bounded by ``max_len``; match evaluation is row-local
per group. Skewed/hot groups are the same hazard as every per-group
operator here — the guard turns a silent OOM into a loud error
naming the group-size bound.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def symbolize(
    df: DataFrame,
    type_col: str,
    mapping: Mapping[str, str],
    default: str = "x",
    out_col: str = "sym",
) -> DataFrame:
    """Map an event-type column to single-char symbols (row-local
    CASE). Every symbol must be exactly one char — the string offset
    IS the row number downstream. Unmapped types get ``default`` so
    they still occupy a position (gaps count them as intervening)."""
    for sym in [*mapping.values(), default]:
        if len(sym) != 1:
            raise ValueError(f"symbols must be single chars, got {sym!r}")
    expr: Column | None = None
    col = F.col(type_col)
    for k, v in mapping.items():
        expr = (
            F.when(col == k, F.lit(v))
            if expr is None
            else expr.when(col == k, F.lit(v))
        )
    out = expr.otherwise(F.lit(default)) if expr is not None else F.lit(default)
    return df.withColumn(out_col, out)


def sequence_strings(
    df: DataFrame,
    group_cols: Sequence[str] = ("user_id",),
    order_cols: Sequence[str] = ("ts", "event_id"),
    sym_col: str = "sym",
    max_len: int = 1_000_000,
    out_col: str = "seq_str",
) -> DataFrame:
    """One ordered symbol string per group: collect ``struct(order
    cols..., sym)``, ``array_sort`` (struct compare = field order =
    the window ordering), project the symbol, join to a string.

    The ``max_len`` guard is evaluated inside the output expression
    (not a droppable side column), so a group longer than the bound
    fails the job loudly instead of silently building an unbounded
    string — the signal to move that workload to the stateful
    streaming form."""
    s = F.struct(
        *[F.col(c) for c in order_cols], F.col(sym_col).alias("__sym")
    )
    agg = df.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(s)).alias("__seq")
    )
    sym_str = F.array_join(
        F.transform(F.col("__seq"), lambda x: x["__sym"]), ""
    )
    guarded = F.when(F.size("__seq") <= F.lit(max_len), sym_str).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"sequence group exceeds max_len={max_len}: "),
                F.size("__seq").cast("string"),
                F.lit(" rows"),
            )
        )
    )
    return agg.select(
        *group_cols,
        F.size("__seq").cast("long").alias("seq_len"),
        guarded.alias(out_col),
    )


def match_pattern(
    seqs: DataFrame,
    pattern: str,
    per_anchor: bool = False,
    seq_col: str = "seq_str",
) -> DataFrame:
    """Count pattern matches per group and locate the first one.

    Adds ``n_matches`` (BIGINT) and ``first_pos`` (BIGINT, 1-based
    symbol offset of the first match == the row_number of the first
    matching anchor under the same ordering; 0 = no match). See the
    module doc for the two overlap semantics."""
    pat = F.lit(f"(?={pattern})" if per_anchor else pattern)
    return seqs.withColumn(
        "n_matches", F.regexp_count(F.col(seq_col), pat).cast("long")
    ).withColumn(
        "first_pos", F.regexp_instr(F.col(seq_col), pat).cast("long")
    )

"""Declarative data-quality expectations, evaluated in ONE pass.

A pipeline that writes a 100 TB table needs its quality gates
attached to the same job that produced the data — a separate
validation job doubles the corpus scans. Every rule here compiles to
a conditional aggregate, so an arbitrary rule suite costs one
partial-aggregated pass over the frame (plus nothing per rule), the
same zero-extra-scan stance as operators.quality.observe_validity.
The result is data, not an exception: one row per rule with the
measured metric and its verdict, ready to land in a metrics table —
``raise_on_failure`` upgrades it to a hard gate.

Reference parity: the reference validates payload shape ad hoc
inside extraction (utils/old_history_utils.py:31-45, dict-shape
checks) and otherwise trusts its warehouse constraints; this is the
engine-level generalization.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation: ``violations`` counts offending rows (its
    expression must be an aggregate), ``threshold`` is the max
    tolerated violation FRACTION of total rows (0.0 = none)."""

    name: str
    violations: Column
    threshold: float = 0.0
    details: str = field(default="", compare=False)


def not_null(col: str, threshold: float = 0.0) -> Rule:
    return Rule(
        f"not_null_{col}",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
        threshold,
        f"{col} IS NOT NULL",
    )


def in_range(col: str, lo, hi, threshold: float = 0.0) -> Rule:
    return Rule(
        f"in_range_{col}",
        F.sum(
            F.when(
                F.col(col).isNull()
                | (F.col(col) < lo)
                | (F.col(col) > hi),
                1,
            ).otherwise(0)
        ),
        threshold,
        f"{lo} <= {col} <= {hi}",
    )


def accepted_values(col: str, values, threshold: float = 0.0) -> Rule:
    return Rule(
        f"accepted_values_{col}",
        F.sum(
            F.when(~F.col(col).isin(list(values)), 1).otherwise(0)
        ),
        threshold,
        f"{col} IN {sorted(values)}",
    )


def unique(cols: tuple[str, ...], threshold: float = 0.0) -> Rule:
    """Duplicate rows beyond the first per key count as violations.
    count(*) − count(DISTINCT struct) stays inside the same single
    aggregation (distinct-agg rewrites to a two-phase expand, still
    one pass over the data)."""
    key = F.struct(*[F.col(c) for c in cols])
    return Rule(
        "unique_" + "_".join(cols),
        F.count(F.lit(1)) - F.count_distinct(key),
        threshold,
        f"UNIQUE({', '.join(cols)})",
    )


def matches(col: str, pattern: str, threshold: float = 0.0) -> Rule:
    return Rule(
        f"matches_{col}",
        F.sum(
            F.when(
                F.col(col).isNull() | ~F.col(col).rlike(pattern), 1
            ).otherwise(0)
        ),
        threshold,
        f"{col} RLIKE {pattern}",
    )


class ExpectationError(AssertionError):
    pass


def check_expectations(
    df: DataFrame,
    rules: list[Rule],
    raise_on_failure: bool = False,
) -> DataFrame:
    """Evaluate every rule in one aggregation pass; returns one row
    per rule: (rule, details, n_violations, violation_frac, passed).

    All violation counters ride a single ``agg`` — Catalyst plans one
    partial-aggregated scan however many rules there are. Thresholds
    are fractions of the frame's row count so the same suite works at
    any SF. ``raise_on_failure`` forces the action here and raises
    ``ExpectationError`` naming every failed rule — the CI-gate mode;
    the default returns the verdict frame for the caller to land.
    """
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        r.violations.cast("long").alias(f"__v{i}")
        for i, r in enumerate(rules)
    ]
    row = df.agg(*aggs)
    per_rule = [
        F.struct(
            F.lit(r.name).alias("rule"),
            F.lit(r.details).alias("details"),
            F.col(f"__v{i}").alias("n_violations"),
            F.round(
                F.col(f"__v{i}")
                / F.greatest(F.col("__total"), F.lit(1)),
                6,
            ).alias("violation_frac"),
            (
                F.col(f"__v{i}")
                <= F.lit(r.threshold) * F.col("__total")
            ).alias("passed"),
        )
        for i, r in enumerate(rules)
    ]
    out = row.select(
        F.explode(F.array(*per_rule)).alias("r")
    ).select("r.rule", "r.details", "r.n_violations",
             "r.violation_frac", "r.passed")
    if raise_on_failure:
        failed = [
            (r["rule"], r["n_violations"])
            for r in out.collect()
            if not r["passed"]
        ]
        if failed:
            raise ExpectationError(
                "expectations failed: "
                + ", ".join(f"{n} ({v} violations)" for n, v in failed)
            )
    return out

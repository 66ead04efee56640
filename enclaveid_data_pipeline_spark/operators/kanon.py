"""Privacy-preserving release operators: k-anonymity suppression,
l-diversity audit, and a generalization ladder — the structural
complement to token-level PII redaction (`functions/redact.py`).

Redaction removes identifiers from VALUES; these operators bound what
the SHAPE of a release leaks: a quasi-identifier combination shared
by fewer than k rows re-identifies its members by joining any outside
table on those columns (Sweeney's linkage attack), and a group whose
sensitive column holds fewer than l distinct values leaks the
sensitive value even when k-anonymous (homogeneity attack).

Every operator is one grouped aggregate plus a broadcast-back join —
linear at any scale, no windows, no pairs:

- :func:`suppress_small_groups` — drop all rows of quasi-identifier
  groups smaller than k (suppression model of k-anonymity).
- :func:`k_anonymity_report` — one-row release audit: kept/suppressed
  rows and groups at a given k.
- :func:`l_diversity_failures` — k-anonymous-but-homogeneous groups:
  quasi-groups whose sensitive column has < l distinct values.
- :func:`choose_generalization` — driver loop over an ORDERED ladder
  of coarsenings (finest first, each one aggregate over the frame);
  returns the first level whose suppression rate meets the budget.
  The loop is over ladder LEVELS (a handful), never over data.

Determinism: groups and counts are exact; no RNG anywhere, so the
DuckDB oracles replay bit-identically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_N = "__kn"


def _group_counts(df: DataFrame, quasi: Sequence[str]) -> DataFrame:
    return df.groupBy(*quasi).agg(F.count(F.lit(1)).alias(_N))


def suppress_small_groups(
    df: DataFrame, quasi: Sequence[str], k: int
) -> DataFrame:
    """Rows whose quasi-identifier group has ≥ k members (the
    k-anonymous release under the suppression model).  One grouped
    count + one equi-join back on the quasi columns; null quasi
    values form their own group (SQL GROUP BY semantics), matching
    the oracle."""
    keep = _group_counts(df, quasi).filter(F.col(_N) >= k).drop(_N)
    # NULL quasi-values form their own group under GROUP BY, so the
    # join back must be null-safe — a plain equi-join would silently
    # drop every NULL-group row regardless of its group's size.
    renamed = keep.select(
        *[F.col(c).alias(f"__kq_{c}") for c in quasi]
    )
    cond = None
    for c in quasi:
        piece = F.col(c).eqNullSafe(F.col(f"__kq_{c}"))
        cond = piece if cond is None else cond & piece
    return df.join(renamed, cond, "left_semi")


def k_anonymity_report(
    df: DataFrame, quasi: Sequence[str], k: int
) -> DataFrame:
    """One-row audit of a release at anonymity level k: how many rows
    and quasi-groups survive, how many are suppressed."""
    g = _group_counts(df, quasi)
    kept = F.col(_N) >= k
    return g.agg(
        F.lit(k).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("kept_groups"),
        F.sum(F.when(~kept, 1).otherwise(0))
        .cast("long")
        .alias("suppressed_groups"),
        F.sum(F.when(kept, F.col(_N)).otherwise(0))
        .cast("long")
        .alias("kept_rows"),
        F.sum(F.when(~kept, F.col(_N)).otherwise(0))
        .cast("long")
        .alias("suppressed_rows"),
    )


def l_diversity_failures(
    df: DataFrame,
    quasi: Sequence[str],
    sensitive: str,
    l_min: int,
    k: int = 1,
) -> DataFrame:
    """Quasi-groups that pass k-anonymity yet leak through
    homogeneity: group size ≥ k but fewer than ``l_min`` DISTINCT
    sensitive values.  Returns the group keys with their size and
    diversity — the worklist a release gate must generalize or drop."""
    g = df.groupBy(*quasi).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct(sensitive).cast("long").alias("n_sensitive"),
    )
    return g.filter(
        (F.col("n_rows") >= k) & (F.col("n_sensitive") < l_min)
    )


def choose_generalization(
    df: DataFrame,
    ladder: Sequence[tuple[str, Sequence[Column]]],
    k: int,
    max_suppressed_fraction: float,
) -> tuple[str, DataFrame]:
    """Walk an ordered generalization ladder (finest quasi-identifier
    first) and return ``(level_name, k_anonymity_report_df)`` for the
    FIRST level whose suppressed-row fraction is within budget; the
    last level is returned even when over budget (callers check).

    Each ladder entry is ``(name, [quasi expression columns])``; each
    probe is ONE aggregate over the frame (collected to a single
    row), so the driver loop costs |ladder| linear passes — the
    classic utility-vs-privacy trade: coarser quasi-identifiers
    suppress less but reveal less structure."""
    last: tuple[str, DataFrame] | None = None
    for name, cols in ladder:
        tagged = df.select(
            *[c.alias(f"__q{i}") for i, c in enumerate(cols)]
        )
        rep = k_anonymity_report(
            tagged, [f"__q{i}" for i in range(len(cols))], k
        )
        last = (name, rep)
        row = rep.collect()[0]
        total = row.kept_rows + row.suppressed_rows
        if total == 0 or row.suppressed_rows <= max_suppressed_fraction * total:
            return name, rep
    assert last is not None, "empty generalization ladder"
    return last

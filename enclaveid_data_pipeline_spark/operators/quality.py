"""LLM-output validation counters (SURVEY §2.4 A3, §2.10 M9, §2.2 P10).

The reference counts invalid LLM responses (wrong type, wrong key
set, invalid times) and surfaces them as materialization metadata
(utils/recent_history_utils.py:138-186, assets/recent_history.py:
107-120). In-engine those counters are a grouped aggregation over
validity predicates — a first-class DataFrame output (or an
``observe()`` metric stream), not a side effect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: P5: the reference's HH:MM validity regex
#: (utils/recent_history_utils.py:164-168).
HHMM_RE = r"^\d{2}:\d{2}$"


def validity_counters(
    df: DataFrame,
    valid_col: Column,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Count rows / invalid rows / error rate per group.

    ``valid_col`` is any boolean validity predicate (e.g. parsed
    struct non-null, key set complete, times matching HHMM_RE).
    """
    invalid = (~valid_col).cast("long")
    keys = list(group_cols)
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(invalid).alias("n_invalid"),
    )
    return agg.withColumn(
        "error_rate",
        F.round(F.col("n_invalid").cast("double") / F.col("n_rows"), 6),
    )


def session_shape_valid(parsed: Column) -> Column:
    """P10: the reference's dict-shape check — parsed struct non-null
    and all four required fields present, with both times matching
    the HH:MM regex (utils/recent_history_utils.py:140-168)."""
    return (
        parsed.isNotNull()
        & parsed["description"].isNotNull()
        & parsed["interests"].isNotNull()
        & parsed["time_start"].rlike(HHMM_RE)
        & parsed["time_end"].rlike(HHMM_RE)
    )


def session_validity_counters(
    exploded: DataFrame,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The reference's full all/invalid accounting over ALL extracted
    objects (utils/recent_history_utils.py:138-168): ``all_sessions``
    counts every flattened object (list elements included),
    ``invalid_types`` the non-dicts among them, ``invalid_keys`` the
    dicts with the wrong key set, ``invalid_times`` the key-valid
    dicts failing the HH:MM regex, ``valid_sessions`` the survivors
    — each stage filtering the previous, so
    ``all = invalid_types + invalid_keys + invalid_times + valid``.

    Input is the frame from
    ``functions.jsonextract.explode_session_objects`` (r3's
    chunk-level counters could not see objects 2..N of a response;
    these are defined object-level like the reference's)."""
    keys = list(group_cols)
    return exploded.groupBy(*keys).agg(
        F.sum(F.col("is_object").cast("long")).alias("all_sessions"),
        F.sum(
            (F.col("is_object") & ~F.col("is_dict")).cast("long")
        ).alias("invalid_types"),
        F.sum(
            (F.col("is_dict") & ~F.col("keys_valid")).cast("long")
        ).alias("invalid_keys"),
        F.sum(
            (F.col("keys_valid") & ~F.col("valid")).cast("long")
        ).alias("invalid_times"),
        F.sum(F.col("valid").cast("long")).alias("valid_sessions"),
    )


def observe_validity(
    df: DataFrame,
    valid_col: Column,
    name: str = "quality",
) -> DataFrame:
    """M9 as a zero-cost metric stream: attach the validity counters
    with ``Dataset.observe`` — computed DURING whatever action next
    consumes ``df`` (no second pass over the data, unlike a separate
    counters aggregation) and read back via
    ``df.observe``'s Observation or the QueryExecutionListener.

    Use when the counters are operational telemetry rather than a
    downstream input; use :func:`validity_counters` when they are a
    first-class output table. At 100 TB the difference is one full
    extra scan.
    """
    invalid = (~valid_col).cast("long")
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(invalid).alias("n_invalid"),
    )

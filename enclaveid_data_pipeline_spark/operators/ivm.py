"""Incremental view maintenance for JOINS — the delta-join identity.

operators.rollup keeps AGGREGATE views fresh in O(batch); this module
does the same for a materialized join view. For append-only deltas
(ΔA, ΔB arriving since the view was built):

    (A ∪ ΔA) ⋈ (B ∪ ΔB)
        = A⋈B  ∪  ΔA⋈(B ∪ ΔB)  ∪  A⋈ΔB

so the refresh touches the deltas against each (bucketed) base side —
the stored view itself is append-to, never recomputed, and the corpus
⋈ corpus join never runs again. ΔA⋈ΔB rides the middle term (ΔA
against the UPDATED B) exactly once; the classic symmetric form
(ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) is algebraically identical — this grouping
just issues two joins instead of three.

Append-only is the contract: updates/deletes must first be reduced to
inserts by the CDC operators (operators.cdc.apply_changes on each
base, then rebuild affected keys) — the same layering a real IVM
engine uses. At scale A and B live bucketed on the join key, so both
delta joins co-locate and the only data moved per refresh is the
deltas themselves.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_join(
    view: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str] | str,
) -> DataFrame:
    """Fold insert-deltas into a materialized inner-join view.
    Returns the refreshed view == ``(a_old ∪ Δa) ⋈ (b_old ∪ Δb)``
    (the invariant the oracle query and property test pin), at the
    cost of two delta-sized joins and zero base⋈base work."""
    cols = [on] if isinstance(on, str) else list(on)
    b_new = b_old.unionByName(delta_b)
    return (
        view.unionByName(delta_a.join(b_new, cols))
        .unionByName(a_old.join(delta_b, cols))
    )


def maintain_sum_count_view(
    view: DataFrame,
    changes: DataFrame,
    group_keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Retraction-based refresh of a SUM/COUNT group-by view from a
    change feed (operators.cdc.table_changes images): each
    insert/update_post row adds its measures, each
    delete/update_pre row subtracts them — so updates that MOVE a
    row between groups maintain both groups correctly (the
    post-image credits the new group, the pre-image debits the old).
    Groups whose count reaches zero drop out of the view.

    SUM and COUNT are self-inverse under retraction, which is why
    this works for arbitrary update/delete churn where
    operators.rollup's mergeable-sketch folds require append-only
    input; MIN/MAX are NOT maintainable this way (a retraction can
    expose an unknown second-best — recompute affected groups via
    the CDC layering instead).

    Measures must be exact-arithmetic columns (integers / decimals):
    the refreshed view is summed in a different order than a
    recompute, so float measures would drift by IEEE
    non-associativity. Shape: one groupBy over the (small) feed,
    then one union+groupBy against the view — a delta-sized shuffle
    plus a view-sized one; with view and feed both hash-partitioned
    on ``group_keys`` the merge is co-located.

    ``view`` columns must be exactly ``group_keys + sum_cols +
    [count_col]``; the refreshed frame has the same schema, so the
    operator composes with itself across feed batches.
    """
    group_keys = list(group_keys)
    sum_cols = list(sum_cols)
    sign = (
        F.when(
            F.col("change_type").isin("insert", "update_post"), F.lit(1)
        )
        .when(
            F.col("change_type").isin("delete", "update_pre"), F.lit(-1)
        )
        .otherwise(F.lit(None))
    )
    delta = (
        changes.withColumn("__sign", sign)
        .groupBy(*group_keys)
        .agg(
            *[
                F.sum(F.col(c) * F.col("__sign")).alias(c)
                for c in sum_cols
            ],
            F.sum("__sign").alias(count_col),
        )
    )
    merged = (
        view.select(*group_keys, *sum_cols, count_col)
        .unionByName(delta)
        .groupBy(*group_keys)
        .agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.sum(count_col).alias(count_col),
        )
    )
    return merged.filter(F.col(count_col) > 0)


def refresh_touched_groups(
    view: DataFrame,
    base_now: DataFrame,
    changes: DataFrame,
    group_keys: Sequence[str],
    measures: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Partial-recompute refresh for aggregates retraction can't
    maintain (MIN/MAX — a delete can expose an unknown second-best):
    the groups named by the change feed are re-aggregated from the
    CURRENT base state; every other group's view row is carried
    over untouched. Cost is O(|view| + rows-of-touched-groups),
    never a base rescan — the standard partial-recompute layering a
    real IVM engine falls back to, composing with
    :func:`maintain_sum_count_view` (additive measures) over the
    same operators.cdc.table_changes feed.

    ``measures``: ``{out_col: (agg_fn, src_col)}`` with ``agg_fn``
    any pyspark.sql.functions aggregate name ('min', 'max', 'sum',
    ...) or 'count' (src ignored). Groups whose rows were all
    deleted re-aggregate to zero rows and drop out; groups
    introduced by inserts appear. Shape: one distinct over the feed,
    one left-semi + groupBy over the base (both shuffle on
    ``group_keys``; with base and view bucketed on them the passes
    co-locate), one left-anti on the view.
    """
    group_keys = list(group_keys)
    touched = changes.select(*group_keys).distinct()
    aggs = []
    for name, (kind, src) in measures.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(name))
        else:
            aggs.append(getattr(F, kind)(src).alias(name))
    recomputed = (
        base_now.join(touched, group_keys, "left_semi")
        .groupBy(*group_keys)
        .agg(*aggs)
    )
    untouched = view.join(touched, group_keys, "left_anti")
    return untouched.unionByName(recomputed)

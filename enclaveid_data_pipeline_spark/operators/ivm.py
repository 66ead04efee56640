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

from collections.abc import Sequence

from pyspark.sql import DataFrame


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

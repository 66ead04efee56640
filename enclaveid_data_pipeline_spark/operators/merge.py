"""Connected-components merge (SURVEY §2.3 J4 rewrite, §7.3 hard part 2).

The reference merges near-duplicate sessions with a driver-side loop:
for each candidate pair it UPDATEs one row to the merged span and
DELETEs the other (assets/recent_history.py:416-447) — order-dependent
(its own TODO flags "problems with the current logic", 375-383) and
O(pairs) network round trips.

The set-based rewrite: candidate pairs are edges; merge groups are
connected components; the merged row is an aggregate over the
component (min start / max end — A6 GREATEST/LEAST as aggregates).
Deterministic, order-independent, idempotent.

Algorithm: iterated min-label propagation with pointer-jumping
(each round: label(v) ← min over v's neighbors' labels and the label
of v's label), which converges in O(log n) rounds on any component —
the "hash-to-min" scheme of Rastogi et al. (2012), the same family
GraphFrames uses. Each round is two shuffles on bigint keys; rounds
are cheap and the loop ends as soon as a round changes nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize as _materialize


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    materialize: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Label each node with the MIN node id of its component.

    ``edges`` is undirected input (each pair listed once is enough).
    Returns ``(node, component)``. Nodes appear iff they appear in an
    edge — union isolated nodes in upstream if needed.

    ``materialize`` picks the per-round lineage-cut strategy (see
    ``materialize.py``): default localCheckpoint for single-JVM runs;
    ``reliable``/``table`` make every round durable so an executor
    loss mid-iteration recovers instead of failing the job — the
    cluster setting for corpus-scale components.

    ``stats`` (optional dict) receives ``{"rounds": r}`` — the number
    of propagation rounds actually run, pinned ≲ log₂(diameter)+2 by
    the stress test so convergence-rate regressions fail CI.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # label(v) = min(v, min neighbor) as the starting point
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("mn"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("mn")).alias("label"),
        )
    )
    sym = _materialize(sym, materialize)

    from ..materialize import RollingBoundary

    # lag=1: round k+1's neighbor/jump joins still read round k's
    # pinned block while round k+1's boundary is being produced
    boundary = RollingBoundary(lag=1)
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        # neighbor minimum
        nbr = (
            sym.join(labels, sym.a == labels.node)
            .select(F.col("b").alias("node"), F.col("label"))
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        # pointer jump: label of my label
        jump = (
            labels.alias("l1")
            .join(
                labels.alias("l2"),
                F.col("l1.label") == F.col("l2.node"),
                "left",
            )
            .select(
                F.col("l1.node").alias("node"),
                F.col("l1.label").alias("label"),
                F.col("l2.label").alias("jump_label"),
            )
        )
        new_labels = (
            jump.join(nbr, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("jump_label"), F.col("label")),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
                # carry the incoming label through the boundary so the
                # convergence check is a filter over the pinned blocks
                # instead of a per-round shuffle join of new vs old
                # (r12: ~15-25% off the whole iteration at gate SF,
                # result-identical — the fixed point of min-label
                # propagation does not depend on the check's plan)
                F.col("label").alias("__old"),
            )
        )
        new_labels = boundary(new_labels, materialize)  # cut lineage per round
        changed = (
            new_labels.filter(F.col("label") != F.col("__old"))
            .limit(1)
            .count()
        )
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select("node", F.col("label").alias("component"))


def merge_components(
    rows: DataFrame,
    components: DataFrame,
    id_col: str,
    agg_exprs: dict[str, F.Column],
) -> DataFrame:
    """Collapse rows to one per component with the given aggregates.

    Rows whose id has no component (never appeared in a candidate
    pair) keep themselves as singleton components — matching the
    reference's behavior of leaving unmerged sessions in place.
    """
    joined = rows.join(
        components, rows[id_col] == components["node"], "left"
    ).withColumn(
        "component", F.coalesce(F.col("component"), rows[id_col])
    ).drop("node")
    return joined.groupBy("component").agg(
        *[expr.alias(name) for name, expr in agg_exprs.items()]
    )

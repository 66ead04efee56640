"""Change-data-capture operators: latest-wins snapshots, SCD Type-2
history, and changelog-into-snapshot merge.

The reference keeps its per-user tables fresh by re-materializing
them wholesale when the poll sensor fires (reference
sensors/__init__.py:16-40) and upserts into Postgres by
delete-then-append per partition (reference
assets/recent_history.py:127-178). At 100 TB neither form survives:
the engine needs the *changelog* algebra — reduce a stream of keyed
change rows to current state, fold a new batch of changes into a
persisted snapshot in O(|snapshot| + |batch|), and keep attribute
history as validity intervals instead of overwriting it.

All three operators are one window or one union+window over rows
hash-partitioned by the business key — no driver state, no
iteration. At scale, snapshot and changelog both live bucketed by
``keys``, which turns every shuffle here into a co-located,
exchange-free pass; the same layout serves the point-lookup path.

Ordering discipline: ``seq_cols`` must be a TOTAL order per key
(e.g. ``(ts, event_id)`` with a unique id last). With ties possible,
"latest" is nondeterministic under retries — the same reason the
split operator hashes instead of calling ``rand()``.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _desc_order(seq_cols: Sequence[str]) -> list[Column]:
    return [F.col(c).desc() for c in seq_cols]


def latest_snapshot(
    changelog: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("D",),
) -> DataFrame:
    """Reduce a changelog to current state: the newest row per key,
    with keys whose newest row is a delete removed entirely (the
    Debezium/CDC contract: a trailing tombstone wins).

    One window over one shuffle on ``keys``. ``WindowGroupLimit``
    pushes the rank-1 filter below the sort at the partial level, so
    each map task forwards at most one row per key it holds — the
    shuffle carries surviving candidates, not the changelog.
    """
    w = Window.partitionBy(*keys).orderBy(*_desc_order(seq_cols))
    cur = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if op_col is not None:
        cur = cur.filter(~F.col(op_col).isin(list(delete_ops)))
    return cur


def apply_changes(
    snapshot: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("D",),
) -> DataFrame:
    """Fold one batch of change rows into a persisted snapshot —
    the engine form of MERGE INTO (and of the reference's
    delete-then-append upsert, assets/recent_history.py:127-178):
    inserts appear, newer updates win, deletes drop the key.

    ``union → newest-per-key`` rather than join-per-case: one window
    pass handles insert/update/delete uniformly, and equals a full
    :func:`latest_snapshot` recompute over the concatenated
    changelog (the invariant the ``cdc_merge_upsert`` oracle pins)
    because picking the newest of (newest-of-A, B) is associative
    when ``seq_cols`` is a total order. Cost is
    O(|snapshot| + |batch|), never corpus history; with both sides
    bucketed by ``keys`` the union aggregates without an exchange.

    The snapshot side carries no ``op_col`` (it holds only live
    rows); batch rows supply theirs, snapshot rows rank as plain
    upserts.

    Delete caveat (the limit of the associativity claim): because
    the returned snapshot DROPS tombstones, folding a batch that
    carries a row with ``seq_cols`` OLDER than an already-applied
    delete resurrects the deleted key — a full
    :func:`latest_snapshot` recompute over the whole changelog would
    keep it dead. Batches must therefore be seq-monotone per key:
    never deliver a row older than a delete already folded for that
    key (the at-least-once redelivery window must not straddle a
    fold boundary). When that cannot be guaranteed, keep tombstones
    in the stored table and filter at read time — exactly what
    ``streaming.sinks.cdc_snapshot_sink`` /
    ``read_cdc_snapshot`` do; their fold is idempotent under
    arbitrary reordering because deletes persist as rows.
    """
    if op_col is None:
        merged = snapshot.unionByName(batch)
        return latest_snapshot(merged, keys, seq_cols)
    snap = snapshot.withColumn(op_col, F.lit("U"))
    merged = snap.unionByName(batch.select(*snap.columns))
    return latest_snapshot(
        merged, keys, seq_cols, op_col=op_col, delete_ops=delete_ops
    ).drop(op_col)


def scd2_history(
    changelog: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension Type 2: collapse a changelog into
    validity intervals per key — one row per *change* of the tracked
    attributes, carrying ``effective_from`` (this row's ``seq_col``),
    ``effective_to`` (the next change's, NULL while current),
    ``is_current`` and a per-key ``version`` ordinal.

    Two windows over the SAME partitioning (keys) and ordering, so
    Catalyst plans one shuffle and one sort for both: a ``lag`` per
    attribute marks change rows (``IS DISTINCT FROM`` keeps
    NULL-valued attributes honest), then ``lead``/``row_number`` over
    the surviving change rows close the intervals. Consecutive
    duplicates collapse — re-delivered unchanged rows never mint
    spurious versions, which is what makes the operator safe to run
    over at-least-once ingest.
    """
    order = [F.col(seq_col)] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    # first row per key always opens an interval; afterwards a row is
    # a change iff ANY tracked attribute differs null-safely from the
    # previous row's value
    changed = F.row_number().over(w) == 1
    for a in attr_cols:
        changed = changed | ~F.lag(F.col(a)).over(w).eqNullSafe(F.col(a))

    change_rows = changelog.withColumn("__is_change", changed).filter(
        F.col("__is_change")
    )

    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        change_rows.withColumn(
            "effective_from", F.col(seq_col)
        )
        .withColumn("effective_to", F.lead(seq_col).over(w2))
        .withColumn("is_current", F.col("effective_to").isNull())
        .withColumn("version", F.row_number().over(w2))
        .drop("__is_change")
    )


def table_changes(
    df_from: DataFrame,
    df_to: DataFrame,
    keys: Sequence[str],
    schema_evolution: bool = False,
) -> DataFrame:
    """Change feed between two states of a keyed table: the rows an
    incremental consumer must apply to turn ``df_from`` into
    ``df_to`` — the batch emulation of a warehouse change-data-feed
    (Delta CDF / Iceberg changelog shape). Returns ``df_to``'s
    columns plus ``change_type`` ∈ {'insert', 'delete',
    'update_pre', 'update_post'}; updates emit BOTH images so a
    downstream aggregate can retract the old row and apply the new
    (the update_pre/update_post convention consumed by incremental
    view maintenance, operators.ivm). Unchanged rows emit nothing.

    Keys must be non-null and unique per state (the snapshot
    contract); attribute comparison is null-safe per column — no row
    hashing, so a hash collision can never mask an update.

    Shape: ONE full-outer equi-join on ``keys`` (both sides shuffle
    hash-partitioned — co-located and exchange-free when the
    snapshots live bucketed by key, sources.layout.save_bucketed)
    followed by a row-local CASE + explode that emits 0, 1, or 2
    struct rows. The join runs once: the four change classes are
    branches of one array expression, not four filters over a
    re-executed join.

    ``schema_evolution=True`` makes the feed safe across an evolving
    table (the Delta-CDF reading of column adds/drops): the feed's
    schema is always ``df_to``'s; a column ADDED since ``df_from``
    reads as NULL on the pre-image side (so a backfill of the new
    column surfaces as updates, with ``update_pre`` carrying NULL —
    exactly what old files report after an add-column), and a column
    DROPPED from ``df_to`` vanishes from the feed (consumers apply
    changes to the new schema; a drop alone emits nothing, matching
    metadata-only drops that rewrite no data). With the flag off,
    differing column sets stay a hard error — silent schema drift in
    a non-evolving pipeline is a bug, not a feature.
    """
    keys = list(keys)
    non_keys = [c for c in df_to.columns if c not in keys]
    from_non_keys = [c for c in df_from.columns if c not in keys]
    if from_non_keys != non_keys:
        if not schema_evolution:
            raise ValueError(
                "table_changes: from/to column sets differ — "
                f"{df_from.columns} vs {df_to.columns} "
                "(pass schema_evolution=True if intended)"
            )
        to_types = {f.name: f.dataType for f in df_to.schema.fields}
        have = set(df_from.columns)
        df_from = df_from.select(
            *[F.col(k) for k in keys],
            *[
                F.col(c) if c in have
                else F.lit(None).cast(to_types[c]).alias(c)
                for c in non_keys
            ],
        )
    # presence sentinels: after an equi-join ON keys the key columns
    # coalesce, and non-key columns can be legitimately NULL, so
    # side-presence needs its own always-true flag per side
    f_side = df_from.withColumn("__present_f", F.lit(True)).alias("f")
    t_side = df_to.withColumn("__present_t", F.lit(True)).alias("t")
    joined = f_side.join(t_side, on=keys, how="full_outer")
    in_from = F.col("__present_f").isNotNull()
    in_to = F.col("__present_t").isNotNull()
    changed = F.lit(False)
    for c in non_keys:
        changed = changed | ~F.col(f"f.{c}").eqNullSafe(F.col(f"t.{c}"))

    def _img(side: str, tag: str) -> Column:
        return F.struct(
            *[F.col(k).alias(k) for k in keys],
            *[F.col(f"{side}.{c}").alias(c) for c in non_keys],
            F.lit(tag).alias("change_type"),
        )

    emit = (
        F.when(~in_from & in_to, F.array(_img("t", "insert")))
        .when(in_from & ~in_to, F.array(_img("f", "delete")))
        .when(
            changed,
            F.array(_img("f", "update_pre"), _img("t", "update_post")),
        )
        # typed empty array for the unchanged branch: slice an image
        # array to length 0 so the type unifies with the when-branches
        .otherwise(F.slice(F.array(_img("t", "insert")), 1, 0))
    )
    return joined.select(F.explode(emit).alias("ch")).select("ch.*")


# ---- general MERGE INTO (clause algebra) -------------------------------


@dataclass(frozen=True)
class When:
    """One MERGE clause: ``action`` ∈ {'update', 'delete', 'insert'},
    an optional extra ``condition`` beyond the key match, and for
    update/insert an optional ``assign`` map of target-column name →
    expression. Conditions and assignments reference the two sides
    through the fixed aliases ``t`` (target) and ``s`` (source):
    ``F.col("t.price") < F.col("s.price")``.

    ``assign=None`` means the default assignment for the regime:
    updates keep every unassigned target column; inserts take the
    same-named source column, NULL where the source lacks it.
    """

    action: str
    condition: Column | None = None
    assign: dict[str, Column] | None = None


_MATCHED_OK = {"update", "delete"}
_NOT_MATCHED_OK = {"insert"}


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    matched: Sequence[When] = (),
    not_matched: Sequence[When] = (),
    not_matched_by_source: Sequence[When] = (),
    validate_source_unique: bool = True,
    broadcast_source: bool = False,
) -> DataFrame:
    """ANSI/Delta-shaped MERGE INTO as ONE join and a row-local
    clause dispatch — the general upsert primitive the reference
    approximates with delete-then-append per partition (reference
    assets/recent_history.py:127-178), here with the full clause
    algebra: ``WHEN MATCHED [AND cond] THEN UPDATE/DELETE``,
    ``WHEN NOT MATCHED [AND cond] THEN INSERT``, and
    ``WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE/DELETE``.

    Semantics (SQL:2003 + the Delta extension):

    - clauses are tried IN ORDER within their regime; the first
      whose condition holds applies; regimes are disjoint by
      construction so cross-regime order is irrelevant;
    - a matched row no clause claims is kept unchanged; an
      unmatched source row no clause claims inserts nothing; an
      unmatched target row no clause claims is kept unchanged;
    - with ``validate_source_unique`` (the default, and the SQL
      standard's requirement) a target row matched by more than one
      source row raises instead of applying an arbitrary winner —
      the check is a count window over the source's keys, folded
      into the dispatch expression so Catalyst cannot prune it;
    - NULL key values never match (plain equality join), the
      standard's behavior.

    Plan shape: one equi-join on ``keys`` (left-outer when there are
    no NOT MATCHED clauses — source-only rows then produce nothing —
    else full-outer), then a single projection whose per-column
    value is a CASE over the clause tags. Everything is JVM-side
    whole-stage-codegen; at scale the join broadcasts when the
    source is a small feed, and with both sides bucketed by ``keys``
    it runs exchange-free — the snapshot never rewrites wholesale,
    which is the point of MERGE at 100 TB.

    ``broadcast_source`` forces the broadcast when the feed is small
    but above Spark's auto-broadcast threshold (the common
    apply-a-feed shape: gigabyte target, megabyte source). Only
    legal without NOT MATCHED clauses — a full-outer equi-join
    cannot build a broadcast side — so it raises rather than letting
    Catalyst silently drop the hint.
    """
    for cl in matched:
        if cl.action not in _MATCHED_OK:
            raise ValueError(f"matched clause cannot {cl.action!r}")
    for cl in not_matched:
        if cl.action not in _NOT_MATCHED_OK:
            raise ValueError(f"not_matched clause cannot {cl.action!r}")
    for cl in not_matched_by_source:
        if cl.action not in _MATCHED_OK:
            raise ValueError(
                f"not_matched_by_source clause cannot {cl.action!r}"
            )
    missing = [k for k in keys if k not in source.columns]
    if missing:
        raise ValueError(f"source lacks merge keys {missing}")

    out_cols = list(target.columns)
    src_cols = set(source.columns)

    t = target.withColumn("__t_present", F.lit(True)).alias("t")
    s = source
    if validate_source_unique:
        s = s.withColumn(
            "__s_dup",
            F.count(F.lit(1)).over(Window.partitionBy(*[F.col(k) for k in keys])),
        )
    s = s.withColumn("__s_present", F.lit(True)).alias("s")

    cond = None
    for k in keys:
        eq = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = eq if cond is None else cond & eq
    how = "left_outer" if not not_matched else "full_outer"
    if broadcast_source:
        if not_matched:
            raise ValueError(
                "broadcast_source: NOT MATCHED clauses force a "
                "full-outer join, which cannot broadcast a side"
            )
        s = F.broadcast(s)
    joined = t.join(s, cond, how)

    t_in = F.col("t.__t_present").isNotNull()
    s_in = F.col("s.__s_present").isNotNull()
    regimes = [
        (t_in & s_in, matched, "m"),
        (~t_in & s_in, not_matched, "i"),
        (t_in & ~s_in, not_matched_by_source, "u"),
    ]

    tagged: list[tuple[str, When]] = []
    action_col: Column | None = None
    for regime_cond, clauses, prefix in regimes:
        for i, cl in enumerate(clauses):
            tag = f"{prefix}{i}"
            tagged.append((tag, cl))
            c = regime_cond if cl.condition is None else regime_cond & cl.condition
            action_col = (
                F.when(c, tag) if action_col is None else action_col.when(c, tag)
            )
    default = F.when(t_in, F.lit("keep")).otherwise(F.lit("drop"))
    action_col = default if action_col is None else action_col.otherwise(default)
    if validate_source_unique:
        # folded into the action column so the check cannot be pruned
        action_col = F.when(
            t_in & s_in & (F.col("s.__s_dup") > 1),
            F.raise_error(
                F.concat(
                    F.lit("merge_into: target row matched by multiple "
                          "source rows for keys "),
                    F.concat_ws(
                        ",", *[F.col(f"s.{k}").cast("string") for k in keys]
                    ),
                )
            ),
        ).otherwise(action_col)

    joined = joined.withColumn("__action", action_col)
    drop_tags = ["drop"] + [
        tag for tag, cl in tagged if cl.action == "delete"
    ]
    kept = joined.filter(~F.col("__action").isin(drop_tags))

    schema = {f.name: f.dataType for f in target.schema.fields}
    out = []
    for c in out_cols:
        expr: Column | None = None
        for tag, cl in tagged:
            if cl.action == "delete":
                continue
            if cl.action == "update":
                if cl.assign is None or c not in cl.assign:
                    continue  # default: keep the target value
                val = cl.assign[c]
            else:  # insert
                if cl.assign is not None and c in cl.assign:
                    val = cl.assign[c]
                elif cl.assign is None and c in src_cols:
                    val = F.col(f"s.{c}")
                else:
                    val = F.lit(None)
            val = val.cast(schema[c])
            branch = F.col("__action") == tag
            expr = F.when(branch, val) if expr is None else expr.when(branch, val)
        col = F.col(f"t.{c}") if expr is None else expr.otherwise(F.col(f"t.{c}"))
        out.append(col.alias(c))
    return kept.select(*out)

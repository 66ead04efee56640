"""Change-data-capture queries over the ``events`` table
(operators.cdc): latest-wins snapshot reduction, SCD Type-2 validity
intervals, and the batch-into-snapshot merge pinned against a full
recompute.

The ``events`` stream doubles as the changelog: key is
``(user_id, event_type)`` (or ``user_id`` for the dimension case),
``(ts, event_id)`` is the total per-key order, and a deterministic
``op`` column derives deletes from the payload so the oracle can
replay the exact same changelog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import apply_changes, latest_snapshot, scd2_history
from ..sources.readers import read_table
from .registry import register

_DUCK_OP = "CASE WHEN value < 10 THEN 'D' ELSE 'U' END"


def _op():
    """Tombstone rule shared by every query here (and their
    oracles): tiny-value rows are deletes. A function because classic
    PySpark Columns need a live SparkContext at construction."""
    return F.when(F.col("value") < 10, F.lit("D")).otherwise(F.lit("U"))

_TS_S = "yyyy-MM-dd HH:mm:ss"
_DUCK_TS_S = "%Y-%m-%d %H:%M:%S"

#: merge boundary for the upsert query: snapshot is built from rows
#: before this instant, the "incoming batch" is everything after.
_CUTOFF = "2024-01-20 00:00:00"


@register(
    "cdc_latest_snapshot",
    oracle=f"""
    WITH c AS (
        SELECT *, {_DUCK_OP} AS op FROM events
    ), cur AS (
        SELECT * FROM c
        QUALIFY row_number() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT user_id, event_type,
           CAST(event_id AS BIGINT) AS last_event_id,
           round(value, 4) AS last_value,
           strftime(ts, '{_DUCK_TS_S}') AS last_ts
    FROM cur WHERE op <> 'D'
    """,
)
def cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → current state: newest row per (user_id,
    event_type), keys whose newest row is a tombstone dropped. One
    shuffle on the key; ``WindowGroupLimit`` keeps the per-task
    forward volume at one row per key."""
    ch = read_table(spark, sf_dir, "events").withColumn("op", _op())
    cur = latest_snapshot(
        ch, keys=("user_id", "event_type"), seq_cols=("ts", "event_id"),
        op_col="op",
    )
    return cur.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("last_event_id"),
        F.round("value", 4).alias("last_value"),
        F.date_format("ts", _TS_S).alias("last_ts"),
    )


@register(
    "scd2_value_band_history",
    oracle=f"""
    WITH c AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value / 50) AS INT) AS band
        FROM events
    ), m AS (
        SELECT *,
               (row_number() OVER w = 1 OR
                lag(band) OVER w IS DISTINCT FROM band) AS is_change
        FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), ch AS (
        SELECT * FROM m WHERE is_change
    )
    SELECT user_id, band,
           strftime(ts, '{_DUCK_TS_S}') AS effective_from_s,
           coalesce(strftime(lead(ts) OVER w2, '{_DUCK_TS_S}'),
                    'current') AS effective_to_s,
           CAST(lead(ts) OVER w2 IS NULL AS BIGINT) AS is_current,
           CAST(row_number() OVER w2 AS BIGINT) AS version
    FROM ch WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_value_band_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 over a derived dimension attribute (the value
    quartile band per user): one validity interval per change, with
    consecutive duplicates collapsed so at-least-once redelivery
    never mints a version. Both windows share one shuffle+sort on
    user_id."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") / 50).cast("int").alias("band"),
    )
    hist = scd2_history(
        ev, keys=("user_id",), seq_col="ts", attr_cols=("band",),
        tiebreak_cols=("event_id",),
    )
    return hist.select(
        "user_id",
        "band",
        F.date_format("effective_from", _TS_S).alias("effective_from_s"),
        F.coalesce(
            F.date_format("effective_to", _TS_S), F.lit("current")
        ).alias("effective_to_s"),
        F.col("is_current").cast("long").alias("is_current"),
        F.col("version").cast("long").alias("version"),
    )


@register(
    "cdc_merge_upsert",
    oracle=f"""
    WITH c AS (
        SELECT *, {_DUCK_OP} AS op FROM events
    ), cur AS (
        SELECT * FROM c
        QUALIFY row_number() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) = 1
    ), live AS (
        SELECT * FROM cur WHERE op <> 'D'
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_keys,
           round(CAST(sum(CAST(value AS DECIMAL(18, 2))) AS DOUBLE), 2)
               AS sum_value,
           strftime(max(ts), '{_DUCK_TS_S}') AS max_ts_s
    FROM live GROUP BY event_type
    """,
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge invariant, end to end: build a snapshot from the
    changelog before the cutoff, apply the post-cutoff rows as a
    batch with :func:`apply_changes`, and summarize the merged
    state. The oracle computes current state over the WHOLE
    changelog in one pass — hash equality IS the proof that
    fold-a-batch == full recompute, the property that lets the
    100 TB snapshot refresh in O(batch) instead of O(history).
    DECIMAL sum for order-independent money math."""
    keys = ("user_id", "event_type")
    seq = ("ts", "event_id")
    ev = read_table(spark, sf_dir, "events").withColumn("op", _op())
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    snap = latest_snapshot(
        ev.filter(F.col("ts") < cutoff), keys, seq, op_col="op"
    ).drop("op")
    batch = ev.filter(F.col("ts") >= cutoff)
    merged = apply_changes(snap, batch, keys, seq, op_col="op")
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_value"),
        F.date_format(F.max("ts"), _TS_S).alias("max_ts_s"),
    )


#: point-in-time instant for the as-of dimension lookup
_AS_OF = "2024-01-15 00:00:00"


@register(
    "scd2_as_of_lookup",
    oracle=f"""
    WITH c AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value / 50) AS INT) AS band
        FROM events
    ), m AS (
        SELECT *,
               (row_number() OVER w = 1 OR
                lag(band) OVER w IS DISTINCT FROM band) AS is_change
        FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), ch AS (
        SELECT * FROM m WHERE is_change
    ), hist AS (
        SELECT user_id, band, ts AS effective_from,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS effective_to
        FROM ch
    ), at_t AS (
        SELECT user_id, band FROM hist
        WHERE effective_from <= TIMESTAMP '{_AS_OF}'
          AND (effective_to IS NULL
               OR effective_to > TIMESTAMP '{_AS_OF}')
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(user_id) AS BIGINT) AS min_user_id
    FROM at_t GROUP BY band
    """,
)
def scd2_as_of_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension reconstruction — the read side that
    justifies keeping SCD2 history at all: 'what band was every user
    in at instant T?' answered by one interval predicate over the
    validity table (effective_from ≤ T < effective_to), no event
    replay. At scale the history table is partitioned by
    effective_from month, so the as-of filter prunes partitions
    newer than T and the predicate touches a bounded slice. Users
    whose first change postdates T are correctly absent (they had no
    state yet)."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") / 50).cast("int").alias("band"),
    )
    hist = scd2_history(
        ev, keys=("user_id",), seq_col="ts", attr_cols=("band",),
        tiebreak_cols=("event_id",),
    )
    t = F.lit(_AS_OF).cast("timestamp_ntz")
    asof = hist.filter(
        (F.col("effective_from") <= t)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > t))
    )
    return asof.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("user_id").cast("long").alias("min_user_id"),
    )


@register(
    "snapshot_change_feed",
    oracle="""
    WITH f AS (
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM orders WHERE o_orderkey % 5 <> 0
    ), t AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice
                     + CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE 0 END,
                     2) AS price
        FROM orders WHERE o_orderkey % 3 <> 0
    )
    SELECT t.o_orderkey, t.o_custkey, t.price,
           'insert' AS change_type
    FROM t LEFT JOIN f USING (o_orderkey) WHERE f.o_orderkey IS NULL
    UNION ALL
    SELECT f.o_orderkey, f.o_custkey, f.price, 'delete'
    FROM f LEFT JOIN t USING (o_orderkey) WHERE t.o_orderkey IS NULL
    UNION ALL
    SELECT f.o_orderkey, f.o_custkey, f.price, 'update_pre'
    FROM f JOIN t USING (o_orderkey)
    WHERE f.price IS DISTINCT FROM t.price
       OR f.o_custkey IS DISTINCT FROM t.o_custkey
    UNION ALL
    SELECT t.o_orderkey, t.o_custkey, t.price, 'update_post'
    FROM f JOIN t USING (o_orderkey)
    WHERE f.price IS DISTINCT FROM t.price
       OR f.o_custkey IS DISTINCT FROM t.o_custkey
    """,
)
def snapshot_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two derived states of ``orders``
    (operators.cdc.table_changes — the incremental read primitive
    behind sources.layout.snapshot_changes): version A drops every
    5th key, version B drops every 3rd and bumps every 4th key's
    price, so the feed exercises all four change classes. ONE
    full-outer key join + a row-local CASE/explode — the four
    classes are branches of a single array expression, never four
    filters over a re-executed join; per-column null-safe
    comparison, so no row-hash collision can mask an update. The
    oracle replays the same diff as four UNION ALL branches."""
    from ..operators.cdc import table_changes

    orders = read_table(spark, sf_dir, "orders")
    state_f = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("price"),
    )
    state_t = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 4 == 0, F.lit(1)).otherwise(
                F.lit(0)
            ),
            2,
        ).alias("price"),
    )
    return table_changes(state_f, state_t, ["o_orderkey"])


@register(
    "change_feed_aggregate_refresh",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, o_custkey,
               CAST(round((o_totalprice
                    + CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE 0 END)
                    * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 3 <> 0
    )
    SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS total_cents,
           count(*) AS n_orders
    FROM t GROUP BY o_custkey
    """,
)
def change_feed_aggregate_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental aggregate maintenance THROUGH the change feed:
    build a per-customer SUM/COUNT view of state A, diff A→B with
    operators.cdc.table_changes, fold the feed into the view with
    operators.ivm.maintain_sum_count_view (insert/update_post add,
    delete/update_pre subtract — group-moving updates debit the old
    group and credit the new), and return the refreshed view. The
    ORACLE computes state B's aggregate directly, so the green check
    pins the IVM invariant: incremental == recompute, including
    groups created, emptied, and moved between. Integer-cent
    measures keep the differently-ordered sums exact (IEEE
    non-associativity would flunk doubles)."""
    from ..operators.cdc import table_changes
    from ..operators.ivm import maintain_sum_count_view

    orders = read_table(spark, sf_dir, "orders")
    cents_f = F.round(F.col("o_totalprice") * 100).cast("long")
    cents_t = F.round(
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 4 == 0, F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        * 100
    ).cast("long")
    state_f = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", "o_custkey", cents_f.alias("cents")
    )
    state_t = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_custkey", cents_t.alias("cents")
    )
    view = state_f.groupBy("o_custkey").agg(
        F.sum("cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    feed = table_changes(state_f, state_t, ["o_orderkey"])
    return maintain_sum_count_view(
        view,
        feed.withColumnRenamed("cents", "total_cents"),
        group_keys=["o_custkey"],
        sum_cols=["total_cents"],
        count_col="n_orders",
    )


@register(
    "merge_into_orders_feed",
    oracle="""
    WITH t AS (
        SELECT o_orderkey AS id, o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 5 <> 0
    ), s AS (
        SELECT o_orderkey AS id,
               CAST(round(o_totalprice * 100) AS BIGINT) + 500 AS cents,
               (o_orderkey % 7 = 0) AS drop_it
        FROM orders WHERE o_orderkey % 3 = 0
    ), upd AS (
        -- WHEN MATCHED AND s.drop_it THEN DELETE;
        -- WHEN MATCHED AND s.cents > t.cents THEN UPDATE
        SELECT t.id,
               CASE WHEN s.cents > t.cents THEN 'bumped'
                    ELSE t.status END AS status,
               CASE WHEN s.cents > t.cents THEN s.cents
                    ELSE t.cents END AS cents
        FROM t JOIN s ON t.id = s.id
        WHERE NOT s.drop_it
    ), keep_t AS (
        -- WHEN NOT MATCHED BY SOURCE AND t.status = 'P' THEN DELETE
        SELECT t.id, t.status, t.cents
        FROM t LEFT JOIN s ON t.id = s.id
        WHERE s.id IS NULL AND t.status <> 'P'
    ), ins AS (
        -- WHEN NOT MATCHED AND s.cents >= 10000 THEN INSERT
        SELECT s.id, 'new' AS status, s.cents
        FROM s LEFT JOIN t ON t.id = s.id
        WHERE t.id IS NULL AND s.cents >= 10000
    )
    SELECT id, status, cents FROM upd
    UNION ALL SELECT id, status, cents FROM keep_t
    UNION ALL SELECT id, status, cents FROM ins
    """,
)
def merge_into_orders_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General MERGE INTO (operators.cdc.merge_into) exercising every
    clause regime in one statement — the engine form of the
    reference's per-partition delete-then-append upsert (reference
    assets/recent_history.py:127-178) generalized to the ANSI/Delta
    clause algebra. Target = orders keeping keys % 5 != 0; source
    feed = keys % 3 == 0 with a price bump and a drop flag. Clauses:
    matched+flag → DELETE, matched+higher price → UPDATE, unmatched
    source ≥ $100 → INSERT as 'new', unmatched target in status 'P'
    → DELETE (purge). One full-outer key join, row-local dispatch —
    the oracle replays each regime as its own join branch."""
    from ..operators.cdc import When, merge_into

    orders = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    target = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderstatus").alias("status"),
        cents.alias("cents"),
    )
    source = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("id"),
        (cents + F.lit(500)).alias("cents"),
        (F.col("o_orderkey") % 7 == 0).alias("drop_it"),
    )
    return merge_into(
        target,
        source,
        keys=("id",),
        matched=(
            When("delete", condition=F.col("s.drop_it")),
            When(
                "update",
                condition=F.col("s.cents") > F.col("t.cents"),
                assign={
                    "cents": F.col("s.cents"),
                    "status": F.lit("bumped"),
                },
            ),
        ),
        not_matched=(
            When(
                "insert",
                condition=F.col("s.cents") >= 10000,
                assign={
                    "id": F.col("s.id"),
                    "status": F.lit("new"),
                    "cents": F.col("s.cents"),
                },
            ),
        ),
        not_matched_by_source=(
            When("delete", condition=F.col("t.status") == "P"),
        ),
    )


@register(
    "minmax_view_partial_refresh",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, o_custkey,
               CAST(round((o_totalprice
                    + CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE 0 END)
                    * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 3 <> 0
    )
    SELECT o_custkey,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents,
           count(*) AS n_orders
    FROM t GROUP BY o_custkey
    """,
)
def minmax_view_partial_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The partial-recompute IVM layer (operators.ivm.
    refresh_touched_groups) driver-gated: MIN/MAX are not
    retractable (a delete can expose an unknown second-best), so the
    view refreshes by re-aggregating ONLY the groups the A→B change
    feed names from the CURRENT base — every untouched group's row
    carries over without its base rows being read. The oracle
    recomputes state B's MIN/MAX/COUNT directly, pinning partial ==
    full recompute across deleted group-minima, moved keys, emptied
    and newly created groups. Same derived states as
    change_feed_aggregate_refresh, so the two IVM layers are
    checked against the same change classes."""
    from ..operators.cdc import table_changes
    from ..operators.ivm import refresh_touched_groups

    orders = read_table(spark, sf_dir, "orders")
    cents_f = F.round(F.col("o_totalprice") * 100).cast("long")
    cents_t = F.round(
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 4 == 0, F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        * 100
    ).cast("long")
    state_f = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", "o_custkey", cents_f.alias("cents")
    )
    state_t = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_custkey", cents_t.alias("cents")
    )
    view = state_f.groupBy("o_custkey").agg(
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    feed = table_changes(state_f, state_t, ["o_orderkey"])
    return refresh_touched_groups(
        view,
        state_t,
        feed,
        group_keys=["o_custkey"],
        measures={
            "min_cents": ("min", "cents"),
            "max_cents": ("max", "cents"),
            "n_orders": ("count", ""),
        },
    )

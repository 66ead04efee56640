"""CDC operators: latest-wins reduction, merge==recompute, SCD2
interval integrity and redelivery idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.cdc import (
    When,
    merge_into,
    apply_changes,
    latest_snapshot,
    scd2_history,
)


def _changelog(spark):
    rows = [
        # key A: insert, update, update
        (1, "A", 10.0, "U"),
        (2, "A", 20.0, "U"),
        (5, "A", 30.0, "U"),
        # key B: insert then delete → gone
        (3, "B", 1.0, "U"),
        (4, "B", 0.0, "D"),
        # key C: delete then re-insert → back
        (6, "C", 0.0, "D"),
        (7, "C", 9.0, "U"),
    ]
    return spark.createDataFrame(rows, "seq long, k string, v double, op string")


def test_latest_snapshot_tombstones(spark):
    cur = latest_snapshot(
        _changelog(spark), keys=("k",), seq_cols=("seq",), op_col="op"
    )
    got = {r["k"]: r["v"] for r in cur.collect()}
    assert got == {"A": 30.0, "C": 9.0}  # B deleted, C resurrected


def test_apply_changes_equals_recompute(spark):
    ch = _changelog(spark)
    for cut in (2, 4, 6):
        snap = latest_snapshot(
            ch.filter(F.col("seq") <= cut), ("k",), ("seq",), op_col="op"
        ).drop("op")
        batch = ch.filter(F.col("seq") > cut)
        merged = apply_changes(snap, batch, ("k",), ("seq",), op_col="op")
        full = latest_snapshot(ch, ("k",), ("seq",), op_col="op").drop("op")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, full.collect())
        ), f"cut={cut}"


def test_scd2_intervals_and_idempotence(spark):
    rows = [
        (1, "A", "x"), (2, "A", "x"), (3, "A", "y"), (4, "A", "x"),
        (1, "B", "z"),
    ]
    ch = spark.createDataFrame(rows, "seq long, k string, attr string")
    hist = scd2_history(ch, ("k",), "seq", ("attr",)).collect()
    a = sorted(
        [
            (r["version"], r["attr"], r["effective_from"], r["effective_to"])
            for r in hist
            if r["k"] == "A"
        ]
    )
    # consecutive duplicate (seq=2) collapsed; intervals chain end-to-start
    assert a == [(1, "x", 1, 3), (2, "y", 3, 4), (3, "x", 4, None)]
    b = [r for r in hist if r["k"] == "B"]
    assert len(b) == 1 and b[0]["is_current"]

    # at-least-once redelivery: duplicating every row changes nothing
    dup = ch.unionByName(ch).dropDuplicates(["seq", "k"])
    hist2 = scd2_history(dup, ("k",), "seq", ("attr",))
    assert sorted(map(tuple, hist2.collect())) == sorted(map(tuple, hist))


def test_scd2_null_attribute_changes(spark):
    rows = [(1, "A", "x"), (2, "A", None), (3, "A", None), (4, "A", "x")]
    ch = spark.createDataFrame(rows, "seq long, k string, attr string")
    hist = scd2_history(ch, ("k",), "seq", ("attr",))
    vs = sorted((r["version"], r["attr"]) for r in hist.collect())
    # x → NULL is a change, NULL → NULL is not, NULL → x is again
    assert vs == [(1, "x"), (2, None), (3, "x")]


# ---- merge_into (general clause algebra) -------------------------------


def _merge_target(spark):
    rows = [
        (1, "alive", 100.0),
        (2, "alive", 50.0),
        (3, "stale", 10.0),
        (4, "alive", 70.0),
    ]
    return spark.createDataFrame(rows, "id long, status string, price double")


def _merge_source(spark):
    rows = [
        (1, 120.0, False),   # matched, higher price → update
        (2, 40.0, False),    # matched, lower price → no clause → keep
        (4, 999.0, True),    # matched, drop flag → delete
        (9, 80.0, False),    # unmatched → insert
        (10, 5.0, False),    # unmatched but below floor → no insert
    ]
    return spark.createDataFrame(rows, "id long, price double, drop_it boolean")


def test_merge_into_full_clause_algebra(spark):
    out = merge_into(
        _merge_target(spark),
        _merge_source(spark),
        keys=("id",),
        matched=(
            When("delete", condition=F.col("s.drop_it")),
            When(
                "update",
                condition=F.col("s.price") > F.col("t.price"),
                assign={"price": F.col("s.price"), "status": F.lit("bumped")},
            ),
        ),
        not_matched=(
            When(
                "insert",
                condition=F.col("s.price") >= 10.0,
                assign={
                    "id": F.col("s.id"),
                    "status": F.lit("new"),
                    "price": F.col("s.price"),
                },
            ),
        ),
        not_matched_by_source=(
            When("delete", condition=F.col("t.status") == "stale"),
        ),
    )
    got = {r["id"]: (r["status"], r["price"]) for r in out.collect()}
    assert got == {
        1: ("bumped", 120.0),  # updated by the second matched clause
        2: ("alive", 50.0),    # matched, no clause fired → unchanged
        9: ("new", 80.0),      # inserted
        # 3 deleted (stale, not matched by source); 4 deleted (flag);
        # 10 not inserted (below floor)
    }


def test_merge_into_clause_order_first_wins(spark):
    # both matched clauses apply to id=1; the FIRST in order wins
    out = merge_into(
        _merge_target(spark),
        _merge_source(spark).filter(F.col("id") == 1),
        keys=("id",),
        matched=(
            When("update", assign={"status": F.lit("first")}),
            When("update", assign={"status": F.lit("second")}),
        ),
    )
    got = {r["id"]: r["status"] for r in out.collect()}
    assert got[1] == "first"
    # untouched target rows pass through a left join (no insert clauses)
    assert got[2] == "alive" and got[3] == "stale"


def test_merge_into_default_insert_takes_source_columns(spark):
    tgt = spark.createDataFrame(
        [(1, 1.0, "x")], "id long, price double, note string"
    )
    src = spark.createDataFrame([(2, 7.5)], "id long, price double")
    out = merge_into(
        tgt, src, keys=("id",), not_matched=(When("insert"),)
    )
    rows = {r["id"]: (r["price"], r["note"]) for r in out.collect()}
    # insert defaults: same-named source columns, NULL where absent
    assert rows[2] == (7.5, None)
    assert rows[1] == (1.0, "x")


def test_merge_into_duplicate_source_match_raises(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    tgt = spark.createDataFrame([(1, 1.0)], "id long, v double")
    src = spark.createDataFrame([(1, 2.0), (1, 3.0)], "id long, v double")
    merged = merge_into(
        tgt, src, keys=("id",),
        matched=(When("update", assign={"v": F.col("s.v")}),),
    )
    with pytest.raises(SparkRuntimeException, match="multiple"):
        merged.collect()
    # and the escape hatch accepts it (arbitrary winner among dups)
    ok = merge_into(
        tgt, src, keys=("id",),
        matched=(When("update", assign={"v": F.col("s.v")}),),
        validate_source_unique=False,
    )
    assert ok.count() >= 1


def test_merge_into_null_keys_never_match(spark):
    tgt = spark.createDataFrame([(None, "t")], "id long, tag string")
    src = spark.createDataFrame([(None, "s")], "id long, tag string")
    out = merge_into(
        tgt, src, keys=("id",),
        matched=(When("update", assign={"tag": F.col("s.tag")}),),
        not_matched=(When("insert"),),
    )
    # NULL keys never match: target row kept as-is, source row inserts
    assert sorted(r["tag"] for r in out.collect()) == ["s", "t"]


# ---- schema evolution across the change feed ---------------------------


def test_table_changes_schema_evolution_added_column(spark):
    from enclaveid_data_pipeline_spark.operators.cdc import table_changes

    v1 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
    )
    # v2 adds `tag`: id=1 backfilled (NULL→'a' is an update), id=2
    # untouched (NULL tag, v unchanged → NO change row), id=3 deleted,
    # id=4 inserted with the new column populated
    v2 = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, None), (4, 40.0, "d")],
        "id long, v double, tag string",
    )
    import pytest

    with pytest.raises(ValueError, match="schema_evolution"):
        table_changes(v1, v2, ["id"])

    feed = table_changes(v1, v2, ["id"], schema_evolution=True)
    assert feed.columns == ["id", "v", "tag", "change_type"]
    got = {(r["id"], r["change_type"]): (r["v"], r["tag"]) for r in feed.collect()}
    assert got == {
        (1, "update_pre"): (10.0, None),   # pre-image: added col reads NULL
        (1, "update_post"): (10.0, "a"),
        (3, "delete"): (30.0, None),
        (4, "insert"): (40.0, "d"),
    }


def test_table_changes_schema_evolution_dropped_column(spark):
    from enclaveid_data_pipeline_spark.operators.cdc import table_changes

    v1 = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y")], "id long, v double, old string"
    )
    v2 = spark.createDataFrame([(1, 10.0), (2, 21.0)], "id long, v double")
    feed = table_changes(v1, v2, ["id"], schema_evolution=True)
    # drop alone emits nothing for id=1; id=2's v change still surfaces
    got = {(r["id"], r["change_type"]) for r in feed.collect()}
    assert got == {(2, "update_pre"), (2, "update_post")}
    assert "old" not in feed.columns


def test_merge_into_broadcast_source_hint(spark):
    import pytest

    tgt = _merge_target(spark)
    src = _merge_source(spark).filter(~F.col("drop_it"))
    merged = merge_into(
        tgt, src, keys=("id",),
        matched=(When("update", assign={"price": F.col("s.price")}),),
        broadcast_source=True,
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {r["id"]: r["price"] for r in merged.collect()}
    assert got[1] == 120.0 and got[3] == 10.0
    # illegal with insert clauses: full-outer cannot broadcast
    with pytest.raises(ValueError, match="full-outer"):
        merge_into(
            tgt, src, keys=("id",),
            not_matched=(When("insert"),),
            broadcast_source=True,
        )

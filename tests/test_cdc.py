"""CDC operators: latest-wins reduction, merge==recompute, SCD2
interval integrity and redelivery idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.cdc import (
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

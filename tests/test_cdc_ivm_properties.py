"""Property tests for the CDC fold and the delta-join identity.

Hypothesis drives random changelogs / random delta splits; ground
truth is a dict-replay (CDC) or a full recompute (IVM). These are the
algebraic claims the 100 TB refresh paths rest on — fold==recompute
must hold for EVERY cut, not the three hand-picked ones in
test_cdc.py.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.cdc import (
    apply_changes,
    latest_snapshot,
)
from enclaveid_data_pipeline_spark.operators.ivm import incremental_join

_SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: (key, op) change rows; seq is the list index → total order.
_changelog = st.lists(
    st.tuples(st.integers(0, 5), st.sampled_from(["U", "U", "U", "D"])),
    min_size=1,
    max_size=30,
)


def _truth(rows):
    """Dict replay of latest-wins with tombstones."""
    state: dict[int, tuple[int, str]] = {}
    for seq, (k, op) in enumerate(rows):
        state[k] = (seq, op)
    return {k: seq for k, (seq, op) in state.items() if op != "D"}


@given(rows=_changelog, cut=st.integers(0, 29))
@_SLOW
def test_cdc_fold_equals_recompute_any_cut(spark, rows, cut):
    cut = min(cut, len(rows) - 1)
    df = spark.createDataFrame(
        [(seq, k, op) for seq, (k, op) in enumerate(rows)],
        "seq long, k long, op string",
    )
    snap = latest_snapshot(
        df.filter(F.col("seq") <= cut), ("k",), ("seq",), op_col="op"
    ).drop("op")
    batch = df.filter(F.col("seq") > cut)
    merged = apply_changes(snap, batch, ("k",), ("seq",), op_col="op")
    got = {r.k: r.seq for r in merged.collect()}
    assert got == _truth(rows)


@given(
    a_keys=st.lists(st.integers(0, 6), min_size=0, max_size=12),
    b_keys=st.lists(st.integers(0, 6), min_size=0, max_size=12),
    am=st.integers(1, 4),
    bm=st.integers(1, 4),
)
@_SLOW
def test_delta_join_identity_any_split(spark, a_keys, b_keys, am, bm):
    a = spark.createDataFrame(
        [(k, i) for i, k in enumerate(a_keys)] or [(99, 0)],
        "k long, av long",
    )
    b = spark.createDataFrame(
        [(k, i) for i, k in enumerate(b_keys)] or [(98, 0)],
        "k long, bv long",
    )
    a_old, da = a.filter(F.col("av") % am != 0), a.filter(F.col("av") % am == 0)
    b_old, db = b.filter(F.col("bv") % bm != 0), b.filter(F.col("bv") % bm == 0)
    view = a_old.join(b_old, "k")
    got = incremental_join(view, a_old, da, b_old, db, "k")
    want = a.join(b, "k")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


# ---- merge_into vs a dict referee --------------------------------------

#: target rows: key → (flag, value); source rows: key → (flag, value)
_table = st.dictionaries(
    st.integers(0, 7),
    st.tuples(st.booleans(), st.integers(-5, 5)),
    max_size=8,
)


def _merge_truth(tgt, src):
    """Referee replay of the fixed clause set used below:
    matched & s.flag           → DELETE
    matched & s.v > t.v        → UPDATE v=s.v
    not matched & not s.flag   → INSERT
    not matched by source & t.flag → DELETE
    """
    out = {}
    for k, (tf, tv) in tgt.items():
        if k in src:
            sf, sv = src[k]
            if sf:
                continue  # matched delete
            out[k] = (tf, sv) if sv > tv else (tf, tv)
        else:
            if tf:
                continue  # not-matched-by-source delete
            out[k] = (tf, tv)
    for k, (sf, sv) in src.items():
        if k not in tgt and not sf:
            out[k] = (sf, sv)  # insert (default: source columns)
    return out


@given(tgt=_table, src=_table)
@_SLOW
def test_merge_into_equals_referee(spark, tgt, src):
    from enclaveid_data_pipeline_spark.operators.cdc import When, merge_into

    tdf = spark.createDataFrame(
        [(k, f, v) for k, (f, v) in sorted(tgt.items())] or [],
        "k long, flag boolean, v long",
    )
    sdf = spark.createDataFrame(
        [(k, f, v) for k, (f, v) in sorted(src.items())] or [],
        "k long, flag boolean, v long",
    )
    got = merge_into(
        tdf,
        sdf,
        keys=("k",),
        matched=(
            When("delete", condition=F.col("s.flag")),
            When(
                "update",
                condition=F.col("s.v") > F.col("t.v"),
                assign={"v": F.col("s.v")},
            ),
        ),
        not_matched=(When("insert", condition=~F.col("s.flag")),),
        not_matched_by_source=(When("delete", condition=F.col("t.flag")),),
    ).collect()
    assert {r.k: (r.flag, r.v) for r in got} == _merge_truth(tgt, src)

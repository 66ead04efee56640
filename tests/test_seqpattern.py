"""Unit coverage for operators.seqpattern (MATCH_RECOGNIZE-lite):
overlap semantics, ordering, the length guard, and symbol validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.seqpattern import (
    match_pattern,
    sequence_strings,
    symbolize,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, i, t) for u, i, t in rows],
        "user_id string, event_id long, event_type string",
    )


def _seqs(spark, rows, **kw):
    df = symbolize(
        _events(spark, rows),
        "event_type",
        {"view": "v", "click": "c", "purchase": "p"},
    )
    return sequence_strings(
        df, group_cols=("user_id",), order_cols=("event_id",), **kw
    )


def test_sequence_string_orders_by_order_cols(spark):
    # rows arrive shuffled; the string must follow event_id order
    rows = [("u", 3, "purchase"), ("u", 1, "view"), ("u", 2, "click")]
    out = _seqs(spark, rows).collect()[0]
    assert out.seq_str == "vcp"
    assert out.seq_len == 3


def test_overlap_semantics_differ(spark):
    # 'vvcp': per-anchor counts both views (each starts a v..c..p
    # within gap 2); non-overlapping leftmost counts one
    rows = [("u", i, t) for i, t in enumerate(["view", "view", "click", "purchase"])]
    seqs = _seqs(spark, rows)
    anchor = match_pattern(seqs, "v.{0,2}c.{0,2}p", per_anchor=True).collect()[0]
    flat = match_pattern(seqs, "v.{0,2}c.{0,2}p", per_anchor=False).collect()[0]
    assert anchor.n_matches == 2
    assert flat.n_matches == 1
    assert anchor.first_pos == 1


def test_gap_bound_excludes_distant_completion(spark):
    # view ... 3 intervening ... click -> gap 3 > 2: no match
    types = ["view", "other", "other", "other", "click", "purchase"]
    rows = [("u", i, t) for i, t in enumerate(types)]
    m = match_pattern(
        _seqs(spark, rows), "v.{0,2}c.{0,2}p", per_anchor=True
    ).collect()[0]
    assert m.n_matches == 0
    assert m.first_pos == 0  # 0 = no match


def test_unmapped_types_occupy_positions(spark):
    # intervening unmapped events count toward the gap
    types = ["view", "other", "other", "click", "purchase"]
    rows = [("u", i, t) for i, t in enumerate(types)]
    out = _seqs(spark, rows).collect()[0]
    assert out.seq_str == "vxxcp"
    m = match_pattern(
        _seqs(spark, rows), "v.{0,2}c.{0,2}p", per_anchor=True
    ).collect()[0]
    assert m.n_matches == 1  # gap 2 is exactly the bound


def test_max_len_guard_raises(spark):
    rows = [("u", i, "view") for i in range(10)]
    with pytest.raises(Exception, match="max_len"):
        _seqs(spark, rows, max_len=5).collect()


def test_multichar_symbol_rejected(spark):
    with pytest.raises(ValueError, match="single chars"):
        symbolize(_events(spark, []), "event_type", {"view": "vw"})

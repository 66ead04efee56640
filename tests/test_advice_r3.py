"""Regression tests for the round-2 ADVICE findings.

Each test pins the exact failure the advisor demonstrated:
regexp-replacement metacharacters in BPE merges, lossy
first-batch detection in the read-merge-overwrite sinks, delete
resurrection in apply_changes' caveat, NULL-key Bloom probes, and
trailing separators left by strip_zone_pattern.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.bpe import GLUE, train_bpe
from enclaveid_data_pipeline_spark.operators.dedup import (
    bloom_fingerprint,
    bloom_membership,
)
from enclaveid_data_pipeline_spark.sources.readers import strip_zone_pattern
from enclaveid_data_pipeline_spark.streaming.sinks import _read_existing


def test_bpe_dollar_in_corpus_does_not_crash(spark):
    # '$5 $5 $5' must train: '$' in the winning pair used to reach
    # regexp_replace's replacement unescaped -> INVALID_REGEXP_REPLACE.
    df = spark.createDataFrame(
        [Row(text="$5 off $5 off $5 off")]
    )
    words, merges = train_bpe(df, n_merges=2)
    assert merges, "expected at least one merge on a repeated token"
    syms = [r["sym"] for r in words.collect()]
    # the merged symbol must still contain the dollar sign
    assert any("$" in s for s in syms)


def test_bpe_backslash_symbol_survives_merge(spark):
    # 'a\b a\b' used to merge to 'a++++b', silently dropping the
    # backslash (Java replacement escape).
    df = spark.createDataFrame([Row(text="a\\b a\\b a\\b")])
    words, merges = train_bpe(df, n_merges=3)
    syms = [r["sym"] for r in words.collect()]
    joined = " ".join(syms)
    assert "\\" in joined, f"backslash lost from vocabulary: {syms!r}"


def test_read_existing_missing_path_is_none(spark, tmp_path):
    assert _read_existing(spark, str(tmp_path / "nope")) is None


def test_read_existing_corrupt_table_raises(spark, tmp_path):
    # A present-but-unreadable table must NOT be treated as "first
    # batch" (that would let the sink overwrite the whole snapshot
    # with one micro-batch).
    bad = tmp_path / "tbl"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        df = _read_existing(spark, str(bad))
        # some Spark versions defer footer reads to job time
        if df is not None:
            df.collect()


def test_bloom_membership_null_key_probe_is_false(spark):
    corpus = spark.createDataFrame([Row(doc="alpha"), Row(doc="beta")])
    fp = bloom_fingerprint(corpus, F.col("doc"), m=1024, k=3)
    probes = spark.createDataFrame(
        [Row(id=1, doc="alpha"), Row(id=2, doc=None), Row(id=3, doc="gamma")]
    )
    out = bloom_membership(probes, fp, "id", F.col("doc"), m=1024, k=3)
    rows = {r["id"]: r["maybe_member"] for r in out.collect()}
    assert rows[1] is True  # member: no false negatives
    assert rows[2] is False  # NULL key: explicit False, never NULL
    assert out.filter(F.col("maybe_member").isNull()).count() == 0
    # NULL-key probe must survive into the output at all
    assert set(rows) == {1, 2, 3}


@pytest.mark.parametrize(
    ("fmt", "want"),
    [
        ("yyyy-MM-dd HH:mm:ssXXX", "yyyy-MM-dd HH:mm:ss"),
        ("yyyy-MM-dd HH:mm:ss X", "yyyy-MM-dd HH:mm:ss"),
        ("yyyy-MM-dd'T'HH:mm:ssZ", "yyyy-MM-dd'T'HH:mm:ss"),
        ("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm:ss"),
    ],
)
def test_strip_zone_pattern_strips_separator(fmt, want):
    assert strip_zone_pattern(fmt) == want


def test_strip_zone_pattern_roundtrip_parses(spark, tmp_path):
    # The NTZ pattern derived from an offset pattern with a space
    # before the zone must parse values WITHOUT the trailing space.
    from enclaveid_data_pipeline_spark.sources.readers import read_csv_table

    p = os.path.join(tmp_path, "t.csv")
    with open(p, "w") as fh:
        fh.write("ts\n2024-03-01 10:00:00\n")
    df = read_csv_table(
        spark,
        p,
        "ts timestamp_ntz",
        timestamp_format="yyyy-MM-dd HH:mm:ss X",
    )
    assert df.count() == 1

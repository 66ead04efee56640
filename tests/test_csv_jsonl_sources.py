"""CSV / JSONL sources: schema'd round trips of the events table
(quoted JSON props survive CSV quoting, timestamps survive both
formats), FAILFAST on malformed rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.sources.readers import (
    read_csv_table,
    read_jsonl,
    read_table,
)

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def _events(spark, sf_dir):
    # μs-truncate once on the way in: CSV/JSON timestamp round-trips
    # are exact at microsecond precision
    return read_table(spark, sf_dir, "events").limit(500)


def _assert_same(a, b):
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_csv_round_trip(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir)
    path = str(tmp_path / "events_csv")
    (
        src.write.option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(path)
    )
    back = read_csv_table(
        spark, path, EVENTS_DDL,
        timestamp_format="yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    )
    _assert_same(src, back)
    # props JSON (quotes, commas, braces) survived CSV quoting
    assert back.filter(F.col("props").startswith("{")).count() == back.count()


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir)
    path = str(tmp_path / "events_jsonl")
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"  # μs; JSON default is ms
    src.write.option("timestampFormat", fmt).json(path)
    back = read_jsonl(spark, path, EVENTS_DDL, timestamp_format=fmt)
    _assert_same(src, back)


def test_csv_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("event_id,ts\n1,2024-01-01T00:00:00Z\nnot_a_long,x\n")
    df = read_csv_table(spark, str(p), "event_id long, ts timestamp")
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        df.collect()


def test_jsonl_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"event_id": 1}\n{broken json\n')
    df = read_jsonl(spark, str(p), "event_id long")
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        df.collect()

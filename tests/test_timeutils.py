from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.functions.timeutils import (
    calendar_offset,
    epoch_seconds,
    hhmm_to_timestamp,
    parse_offset_string,
)


def test_parse_offset_string():
    assert parse_offset_string("-3mo") == (-3, "mo")
    assert parse_offset_string("-15d") == (-15, "d")
    assert parse_offset_string("2h") == (2, "h")
    with pytest.raises(ValueError):
        parse_offset_string("3 months")


def test_calendar_offset_months_clamps_day(spark):
    # May 31 - 3mo must clamp to Feb 29 (2024 is a leap year) and keep
    # the time of day — Polars offset_by semantics (takeout.py:70-72).
    df = spark.createDataFrame(
        [(dt.datetime(2024, 5, 31, 12, 34, 56),)], "ts timestamp"
    )
    out = df.select(calendar_offset(F.col("ts"), "-3mo").alias("x")).first()
    assert out.x == dt.datetime(2024, 2, 29, 12, 34, 56)


def test_calendar_offset_days(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 3, 1, 0, 30, 0),)], "ts timestamp"
    )
    out = df.select(calendar_offset(F.col("ts"), "-15d").alias("x")).first()
    assert out.x == dt.datetime(2024, 2, 15, 0, 30, 0)


def test_epoch_seconds_fractional(spark):
    df = spark.createDataFrame(
        [(dt.datetime(1970, 1, 1, 0, 0, 1, 500000),)], "ts timestamp"
    )
    assert df.select(epoch_seconds(F.col("ts")).alias("x")).first().x == 1.5


def test_hhmm_to_timestamp(spark):
    df = spark.createDataFrame([(dt.date(2024, 1, 2), "09:30")], "d date, h string")
    out = df.select(hhmm_to_timestamp(F.col("d"), F.col("h")).alias("x")).first()
    assert out.x == dt.datetime(2024, 1, 2, 9, 30)

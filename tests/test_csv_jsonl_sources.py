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

# events.ts comes off parquet as TIMESTAMP_NTZ (isAdjustedToUTC=false)
# — the DDL must say so, or the reader would reinterpret wall-clock
# values through the session zone.
EVENTS_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)

#: one user-facing format; writers need it under BOTH option names
#: (Spark picks timestampNTZFormat for NTZ columns and silently
#: ignores timestampFormat there — readers.strip_zone_pattern mirrors
#: this on the read side).
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
TS_FMT_NTZ = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


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
        .option("timestampFormat", TS_FMT)
        .option("timestampNTZFormat", TS_FMT_NTZ)
        .csv(path)
    )
    back = read_csv_table(spark, path, EVENTS_DDL, timestamp_format=TS_FMT)
    _assert_same(src, back)
    # props JSON (quotes, commas, braces) survived CSV quoting
    assert back.filter(F.col("props").startswith("{")).count() == back.count()


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    src = _events(spark, sf_dir)
    path = str(tmp_path / "events_jsonl")
    # μs on both column flavors; JSON default keeps ms only
    (
        src.write.option("timestampFormat", TS_FMT)
        .option("timestampNTZFormat", TS_FMT_NTZ)
        .json(path)
    )
    back = read_jsonl(spark, path, EVENTS_DDL, timestamp_format=TS_FMT)
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


def test_orc_round_trip_partitioned(spark, sf_dir, tmp_path):
    from enclaveid_data_pipeline_spark.sources.readers import read_orc_table
    from enclaveid_data_pipeline_spark.sources.writers import write_orc

    src = _events(spark, sf_dir).withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_orc")
    write_orc(src, path, partition_cols=("event_type",))
    back = read_orc_table(spark, path)
    # partition column round-trips as a real column
    assert set(back.columns) == set(src.columns)
    _assert_same(
        src.select("event_id", "user_id", "event_type", "value"),
        back.select("event_id", "user_id", "event_type", "value"),
    )
    # ORC timestamps are µs-exact like parquet's after truncation
    _assert_same(src.select("event_id", "ts"), back.select("event_id", "ts"))


def test_orc_predicate_pushdown_prunes_partitions(spark, sf_dir, tmp_path):
    from enclaveid_data_pipeline_spark.sources.readers import read_orc_table
    from enclaveid_data_pipeline_spark.sources.writers import write_orc

    src = _events(spark, sf_dir)
    path = str(tmp_path / "events_orc2")
    write_orc(src, path, partition_cols=("event_type",))
    one = read_orc_table(spark, path).filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at scan, not post-filter
    assert "click" in plan
    n_types = src.select("event_type").distinct().count()
    assert n_types > 1
    expected = src.filter(F.col("event_type") == "click").count()
    assert one.count() == expected


def test_text_lines_and_wholetext(spark, tmp_path):
    from enclaveid_data_pipeline_spark.sources.readers import read_text_lines

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("doc one line one\ndoc one line two\n")
    (d / "b.txt").write_text("doc two only line\n")
    lines = read_text_lines(spark, str(d))
    assert lines.columns == ["value"]
    assert lines.count() == 3
    docs = read_text_lines(spark, str(d), wholetext=True).withColumn(
        "src", F.input_file_name()
    )
    rows = {r.src.rsplit("/", 1)[-1]: r.value for r in docs.collect()}
    assert rows["a.txt"].count("\n") == 2
    assert rows["b.txt"] == "doc two only line\n"


def test_read_evolved_merges_added_columns(spark, tmp_path):
    """Files written before a column existed read back as NULL for
    it under mergeSchema; the plain read samples one footer and can
    silently drop the new column (the pitfall read_evolved closes)."""
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.sources.readers import read_evolved

    path = str(tmp_path / "evolve")
    v1 = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("text")
    )
    v1.write.mode("overwrite").parquet(path)
    v2 = spark.range(3, 5).select(
        F.col("id").alias("doc_id"),
        F.lit("b").alias("text"),
        F.lit("en").alias("lang"),
    )
    v2.write.mode("append").parquet(path)

    got = read_evolved(spark, path)
    assert set(got.columns) == {"doc_id", "text", "lang"}
    assert got.count() == 5
    assert got.filter(F.col("lang").isNull()).count() == 3
    assert got.filter("lang = 'en'").count() == 2


def test_csv_quarantine_splits_good_and_bad(spark, tmp_path):
    from enclaveid_data_pipeline_spark.sources.readers import (
        read_csv_with_quarantine,
    )

    p = tmp_path / "feed.csv"
    p.write_text(
        "event_id,value\n"
        "1,10.5\n"
        "not_a_long,x\n"
        "2,20.25\n"
        "3,zzz\n"
    )
    good, bad = read_csv_with_quarantine(
        spark, str(p), "event_id long, value double"
    )
    assert {(r.event_id, r.value) for r in good.collect()} == {
        (1, 10.5), (2, 20.25)
    }
    raw = {r._corrupt_record for r in bad.collect()}
    assert raw == {"not_a_long,x", "3,zzz"}

"""Driver-contract smoke tests: entry() runs, every query runs at
sf0.001, every oracle is syntactically valid DuckDB SQL."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from enclaveid_data_pipeline_spark.sources.readers import TABLES

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_runs_small(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF)
        assert df.count() >= 0, name


def test_oracles_are_valid_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in entrymod.oracle_sql().items():
        con.execute(sql).fetchone()


def test_oracle_names_subset_of_queries():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q

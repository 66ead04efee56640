from __future__ import annotations

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.plans.lineage import column_lineage
from enclaveid_data_pipeline_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"


def _cols(lin, name):
    """Lineage as {source_basename::column} strings for assertions."""
    return {
        f"{src.rstrip('/').rsplit('/', 1)[-1]}::{col}"
        for src, col in lin[name]
    }


def test_projection_arithmetic_and_alias(spark):
    n = read_table(spark, SF, "nation")
    df = n.select(
        F.col("n_name").alias("nation"),
        (F.col("n_nationkey") * 2 + F.col("n_regionkey")).alias("mix"),
    )
    lin = column_lineage(df)
    assert _cols(lin, "nation") == {"nation.parquet::n_name"}
    assert _cols(lin, "mix") == {
        "nation.parquet::n_nationkey",
        "nation.parquet::n_regionkey",
    }


def test_join_pulls_from_both_sides(spark):
    n = read_table(spark, SF, "nation")
    r = read_table(spark, SF, "region")
    df = (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .select(
            "n_name",
            F.concat_ws("-", "n_name", "r_name").alias("tagged"),
        )
    )
    lin = column_lineage(df)
    assert _cols(lin, "n_name") == {"nation.parquet::n_name"}
    assert _cols(lin, "tagged") == {
        "nation.parquet::n_name",
        "region.parquet::r_name",
    }


def test_aggregate_and_filter(spark):
    o = read_table(spark, SF, "orders")
    df = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    lin = column_lineage(df)
    assert _cols(lin, "o_custkey") == {"orders.parquet::o_custkey"}
    # filter column is a control dependency, not data lineage
    assert _cols(lin, "spend") == {"orders.parquet::o_totalprice"}


def test_window_function_excludes_partition_keys(spark):
    from pyspark.sql import Window

    o = read_table(spark, SF, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    df = o.select(
        "o_orderkey", F.lag("o_totalprice").over(w).alias("prev_price")
    )
    lin = column_lineage(df)
    # the lag value derives from its argument ONLY: partition/order
    # keys are control dependencies, excluded from data lineage
    # (round-6 advice — the walk now takes the WindowExpression's
    # function references, not the full reference set that Catalyst
    # reports including the spec keys)
    got = _cols(lin, "prev_price")
    assert "orders.parquet::o_totalprice" in got
    assert "orders.parquet::o_custkey" not in got
    assert "orders.parquet::o_orderdate" not in got


def test_explode_and_union(spark):
    n = read_table(spark, SF, "nation")
    exploded = n.select(
        "n_nationkey", F.explode(F.split("n_name", "a")).alias("piece")
    )
    lin = column_lineage(exploded)
    assert _cols(lin, "piece") == {"nation.parquet::n_name"}

    r = read_table(spark, SF, "region")
    u = n.select(F.col("n_name").alias("name")).unionAll(
        r.select(F.col("r_name").alias("name"))
    )
    lin_u = column_lineage(u)
    assert _cols(lin_u, "name") == {
        "nation.parquet::n_name",
        "region.parquet::r_name",
    }


def test_lineage_runs_zero_jobs(spark):
    n = read_table(spark, SF, "nation")
    df = n.groupBy("n_regionkey").agg(F.count("*").alias("c"))
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    column_lineage(df)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before

"""functions.partitioning.ensure_parallelism contract."""

from __future__ import annotations

import inspect
import time

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.functions import partitioning
from enclaveid_data_pipeline_spark.functions.partitioning import (
    ensure_parallelism,
)


def test_floor_spreads_narrow_input(spark):
    narrow = spark.range(1000).coalesce(1)
    out = ensure_parallelism(narrow, 8)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 1000


def test_floor_is_noop_on_wide_input(spark):
    """A well-split input must pass through IDENTICALLY — at 100 TB
    an unconditional repartition would shuffle the whole corpus."""
    wide = spark.range(1000).repartition(16)
    assert ensure_parallelism(wide, 8) is wide


def test_floor_skips_post_shuffle_frames(spark):
    """Post-aggregate frames are governed by shuffle.partitions/AQE;
    the floor must not touch them (and must not probe them — see
    test_probe_runs_no_job)."""
    agged = spark.range(1000).groupBy((F.col("id") % 10).alias("k")).count()
    assert ensure_parallelism(agged, 8) is agged


def test_floor_applies_after_global_limit(spark):
    """r5 ADVICE (low): a global limit collapses output to a single
    partition no matter what shuffles beneath it — the floor must
    treat post-limit frames as narrow and respread them, else
    compute-dense work downstream of a limit runs serially."""
    limited = (
        spark.range(100000)
        .groupBy((F.col("id") % 1000).alias("k"))
        .count()
        .limit(500)
    )
    out = ensure_parallelism(limited, 8)
    assert out is not limited  # the floor engaged despite the agg below
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 500


def test_floor_disabled_with_zero(spark):
    narrow = spark.range(10).coalesce(1)
    assert ensure_parallelism(narrow, 0) is narrow


def test_floor_defaults_to_cluster_parallelism(spark):
    narrow = spark.range(100).coalesce(1)
    n = spark.sparkContext.defaultParallelism
    assert ensure_parallelism(narrow).rdd.getNumPartitions() == n


def test_helper_never_converts_to_rdd():
    """r4 ADVICE (medium): the old .rdd.getNumPartitions() probe
    eagerly executed upstream shuffle stages under AQE. The helper
    must stay plan-only."""
    import ast

    tree = ast.parse(inspect.getsource(partitioning))
    rdd_attrs = [
        node
        for node in ast.walk(tree)
        if isinstance(node, ast.Attribute) and node.attr == "rdd"
    ]
    assert rdd_attrs == []


def test_probe_runs_no_job(spark):
    """The decision must come from driver-side plan metadata: calling
    the helper on a multi-shuffle frame must launch ZERO Spark jobs
    (the r4 defect ran the whole upstream subplan per probe)."""
    sc = spark.sparkContext
    # Two chained shuffles — the exact shape (pq_encode output) that
    # the old probe double-executed.
    df = (
        spark.range(10000)
        .groupBy((F.col("id") % 100).alias("k"))
        .count()
        .groupBy((F.col("k") % 10).alias("b"))
        .agg(F.sum("count").alias("n"))
    )
    group = f"probe-test-{time.time_ns()}"
    sc.setJobGroup(group, "ensure_parallelism probe audit")
    try:
        ensure_parallelism(df)
        ensure_parallelism(spark.range(50).coalesce(1))
    finally:
        sc.setJobGroup("", "")
    tracker = sc.statusTracker()
    assert tracker.getJobIdsForGroup(group) == []

"""functions.partitioning.ensure_parallelism contract."""

from __future__ import annotations

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


def test_floor_disabled_with_zero(spark):
    narrow = spark.range(10).coalesce(1)
    assert ensure_parallelism(narrow, 0) is narrow


def test_floor_defaults_to_cluster_parallelism(spark):
    narrow = spark.range(100).coalesce(1)
    n = spark.sparkContext.defaultParallelism
    assert ensure_parallelism(narrow).rdd.getNumPartitions() == n

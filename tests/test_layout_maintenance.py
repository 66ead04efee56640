"""Table-maintenance layout ops: small-file compaction (count-
preserving, file-count bound) and range clustering (per-file min/max
narrowing — the stats parquet footers use for data skipping)."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.sources.layout import (
    cluster_by,
    compact_to_file_size,
)
from enclaveid_data_pipeline_spark.sources.readers import read_table


def test_compaction_preserves_data_and_reduces_files(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "ev_small")
    events.repartition(20).write.parquet(path)
    before_files = len(list(pathlib.Path(path).glob("*.parquet")))
    assert before_files == 20
    before_count = events.count()
    before_sum = events.agg(F.sum("event_id")).first()[0]

    after_files = compact_to_file_size(spark, path, target_bytes=1 << 30)

    assert after_files < before_files
    out = spark.read.parquet(path)
    assert out.count() == before_count
    assert out.agg(F.sum("event_id")).first()[0] == before_sum


def test_compaction_with_sort_clusters_files(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    path = str(tmp_path / "ev_clustered")
    events.repartition(16).write.parquet(path)

    compact_to_file_size(
        spark, path, target_bytes=1, sort_cols=("user_id",)
    )

    files = sorted(pathlib.Path(path).glob("*.parquet"))
    assert len(files) > 1
    # Disjoint user_id ranges across files = narrow footer min/max.
    ranges = []
    for f in files:
        row = (
            spark.read.parquet(str(f))
            .agg(F.min("user_id"), F.max("user_id"))
            .first()
        )
        if row[0] is not None:
            ranges.append((row[0], row[1]))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # ranges do not interleave


def test_cluster_by_keeps_rows(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    clustered = cluster_by(events, "event_type", partitions=4)
    assert clustered.count() == events.count()

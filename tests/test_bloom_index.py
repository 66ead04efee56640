"""File-level Bloom indexes (round 8): Delta-style data skipping for
equality/IN predicates on high-cardinality columns, where zone maps
can't prune (hash-clustered layout co-locates each key in one file
but leaves every file's min/max spanning the whole domain).

Correctness contract under test: a bloom may FALSE-KEEP (costs I/O)
but must NEVER false-skip — every file containing the probed value
survives pruning, so `read_snapshot_pruned` returns exactly the rows
a full scan + filter would."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.sources.layout import (
    _FILE_STATS,
    optimize_snapshot,
    pruned_files,
    read_snapshot,
    read_snapshot_pruned,
    write_snapshot,
)


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    """20k rows, 2000 distinct user_ids, HASH-clustered into 16 files
    (each user in exactly one file; per-file min/max ≈ the full
    domain, so zone maps alone prune nothing)."""
    path = str(tmp_path_factory.mktemp("bloom") / "events_hashed")
    df = (
        spark.range(20_000)
        .select(
            (F.col("id") % 2000).alias("user_id"),
            F.concat(F.lit("u"), (F.col("id") % 2000)).alias("user_tag"),
            (F.col("id") % 7).alias("v"),
        )
        .repartition(16, "user_id")
    )
    write_snapshot(
        df, path, stats_cols=["user_id"], bloom_cols=["user_id", "user_tag"]
    )
    return path


def test_bloom_prunes_point_lookup_where_zone_maps_cannot(
    spark, bloom_table
):
    # zone maps alone: hash layout spreads min/max → ~no pruning
    # (drop the bloom from a copy of the manifest to isolate them)
    files, total = pruned_files(bloom_table, [("user_id", "==", 1234)])
    assert total == 16
    # bloom: the user lives in exactly ONE file; fpr ~0.3% per other
    # file means ≤ a couple of false keeps, never 16
    assert len(files) <= 3
    # and the kept set includes the true file: rows are exact
    got = read_snapshot_pruned(
        spark, bloom_table, [("user_id", "==", 1234)]
    )
    want = read_snapshot(spark, bloom_table).filter(F.col("user_id") == 1234)
    assert sorted(r.v for r in got.collect()) == sorted(
        r.v for r in want.collect()
    )
    assert got.count() == 10  # 20k rows / 2000 users


def test_bloom_zone_maps_alone_keep_everything_here(spark, bloom_table):
    """Sanity that the fixture really is the zone-map-blind case:
    strip the bloom entries and the same predicate keeps all files."""
    v = 1  # current snapshot version
    snap_dir = os.path.join(bloom_table, f"snap-{v:05d}")
    with open(os.path.join(snap_dir, _FILE_STATS)) as f:
        manifest = json.load(f)
    stripped = {
        "cols": manifest["cols"],
        "files": {
            n: {k: x for k, x in st.items() if k != "bloom"}
            for n, st in manifest["files"].items()
        },
    }
    try:
        with open(os.path.join(snap_dir, _FILE_STATS), "w") as f:
            json.dump(stripped, f)
        files, total = pruned_files(bloom_table, [("user_id", "==", 1234)])
        assert len(files) == total == 16
    finally:
        with open(os.path.join(snap_dir, _FILE_STATS), "w") as f:
            json.dump(manifest, f)


def test_bloom_string_column_and_in_predicate(spark, bloom_table):
    files, total = pruned_files(
        bloom_table, [("user_tag", "==", "u77")]
    )
    assert len(files) <= 3 < total
    got = read_snapshot_pruned(
        spark, bloom_table, [("user_tag", "==", "u77")]
    )
    assert got.count() == 10

    # IN: union of the values' candidate files (here ≤ 3 true files)
    files, _ = pruned_files(
        bloom_table, [("user_id", "in", (3, 999, 1777))]
    )
    assert len(files) <= 6
    got = read_snapshot_pruned(
        spark, bloom_table, [("user_id", "in", (3, 999, 1777))]
    )
    assert got.count() == 30


def test_bloom_never_false_skips_any_user(spark, bloom_table):
    """Exhaustive no-false-skip check over every 20th user: pruned
    read row-count equals the full-scan filter for each."""
    full = read_snapshot(spark, bloom_table)
    for uid in range(0, 2000, 20):
        files, _ = pruned_files(bloom_table, [("user_id", "==", uid)])
        got = read_snapshot_pruned(
            spark, bloom_table, [("user_id", "==", uid)]
        ).count()
        want = full.filter(F.col("user_id") == uid).count()
        assert got == want == 10, (uid, len(files))


def test_bloom_absent_value_prunes_everything(spark, bloom_table):
    """A value outside the domain: min/max can't exclude it (it's in
    range at some file), the bloom proves absence almost everywhere."""
    files, total = pruned_files(bloom_table, [("user_id", "==", 1001234)])
    # out-of-range → zone maps already kill it; use an in-range gap
    # value instead: user ids are 0..1999, all present — so probe the
    # string column with a tag that never occurs
    files, total = pruned_files(
        bloom_table, [("user_tag", "==", "nope-123")]
    )
    assert len(files) <= 1  # fpr leaves at most a stray file
    got = read_snapshot_pruned(
        spark, bloom_table, [("user_tag", "==", "nope-123")]
    )
    assert got.count() == 0


def test_bloom_survives_optimize_and_unsupported_types_degrade(
    spark, tmp_path
):
    path = str(tmp_path / "blo_opt")
    df = (
        spark.range(2_000)
        .select(
            (F.col("id") % 100).alias("k"),
            F.rand(7).alias("x"),
        )
        .repartition(8, "k")
    )
    write_snapshot(df, path, stats_cols=["k"], bloom_cols=["k"])
    optimize_snapshot(spark, path, partitions=4)
    with open(
        os.path.join(path, "snap-00002", _FILE_STATS)
    ) as f:
        manifest = json.load(f)
    assert manifest["bloom"]["cols"] == ["k"]
    assert all("bloom" in st for st in manifest["files"].values())

    # float bloom column is a typed write-time error (canonical
    # string forms differ between engines)
    with pytest.raises(TypeError, match="string/integer"):
        write_snapshot(
            df, str(tmp_path / "blo_bad"), bloom_cols=["x"]
        )
    # float VALUE against an int bloom column degrades to zone maps
    # (no crash, no bloom false-skip; zone maps may still range-prune)
    files, total = pruned_files(path, [("k", "==", 3.5)])
    got = read_snapshot_pruned(spark, path, [("k", "==", 3.5)])
    assert got.count() == 0 and len(files) >= 1


def test_bloom_survives_cow_dml(spark, tmp_path):
    """Round-8 fix: copy-on-write DML must carry the bloom INDEX
    CONFIG forward (dropping it silently disabled bloom pruning
    table-wide after the first delete) and recompute bitmaps for the
    rewritten files — linked files keep theirs. Post-DML point
    lookups still skip, still never false-skip, and deleted keys
    read zero rows."""
    from enclaveid_data_pipeline_spark.sources.layout import (
        delete_where,
        read_snapshot,
    )

    path = str(tmp_path / "bloom_dml")
    df = (
        spark.range(8_000)
        .select(
            (F.col("id") % 800).alias("user_id"),
            (F.col("id") % 5).alias("v"),
        )
        .repartition(16, "user_id")
    )
    write_snapshot(df, path, stats_cols=["user_id"], bloom_cols=["user_id"])
    delete_where(spark, path, [("user_id", "==", 123)])

    with open(os.path.join(path, "snap-00002", _FILE_STATS)) as f:
        manifest = json.load(f)
    assert manifest["bloom"]["cols"] == ["user_id"]  # config survives
    assert all("bloom" in st for st in manifest["files"].values())

    # deleted key: bloom of the REWRITTEN file no longer contains it
    files, total = pruned_files(path, [("user_id", "==", 123)])
    assert len(files) <= 2 and total == 16
    assert read_snapshot_pruned(
        spark, path, [("user_id", "==", 123)]
    ).count() == 0

    # untouched keys still prune and never false-skip
    full = read_snapshot(spark, path)
    for uid in (7, 400, 799):
        got = read_snapshot_pruned(
            spark, path, [("user_id", "==", uid)]
        ).count()
        assert got == full.filter(F.col("user_id") == uid).count() == 10
        files, _ = pruned_files(path, [("user_id", "==", uid)])
        assert len(files) <= 3

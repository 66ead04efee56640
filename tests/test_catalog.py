from __future__ import annotations

import os
import threading

import pytest

from enclaveid_data_pipeline_spark.sources.catalog import (
    CatalogConflict,
    SnapshotCatalog,
)
from enclaveid_data_pipeline_spark.sources.layout import write_snapshot


def _ids(spark, lo, hi):
    return spark.range(lo, hi).toDF("id")


def _vals(df):
    return sorted(r.id for r in df.collect())


def test_two_table_commit_is_atomic_to_catalog_readers(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    v1 = cat.commit({"fact": _ids(spark, 0, 5), "rollup": _ids(spark, 0, 2)})
    assert v1 == 1
    assert _vals(cat.read(spark, "fact")) == [0, 1, 2, 3, 4]
    assert _vals(cat.read(spark, "rollup")) == [0, 1]

    # a crashed transaction: table data lands, catalog publish never
    # runs -> catalog readers still see the v1 pair
    write_snapshot(_ids(spark, 100, 103), cat.table_path("fact"))
    assert _vals(cat.read(spark, "fact")) == [0, 1, 2, 3, 4]
    assert cat.current_version() == v1

    # the next successful transaction publishes both tables at once
    v2 = cat.commit(
        {"fact": _ids(spark, 10, 13), "rollup": _ids(spark, 10, 11)}
    )
    assert _vals(cat.read(spark, "fact")) == [10, 11, 12]
    assert _vals(cat.read(spark, "rollup")) == [10]
    # time travel: the v1 pair is still consistently readable
    assert _vals(cat.read(spark, "fact", catalog_version=v1)) == [
        0,
        1,
        2,
        3,
        4,
    ]
    assert _vals(cat.read(spark, "rollup", catalog_version=v1)) == [0, 1]
    assert cat.mapping(v2).keys() == {"fact", "rollup"}


def test_disjoint_concurrent_commits_both_land(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat2"))
    cat.commit({"a": _ids(spark, 0, 1), "b": _ids(spark, 0, 1)})

    # both workers capture the same base catalog, then race to
    # publish disjoint tables: rebase must merge, not conflict.
    # (Frames are pre-written on the main thread; the threads race
    # only the pure-python publish step.)
    va = write_snapshot(_ids(spark, 10, 12), cat.table_path("a"))
    vb = write_snapshot(_ids(spark, 20, 23), cat.table_path("b"))
    base_v = cat.current_version()
    base_map = cat.mapping(base_v)
    barrier = threading.Barrier(2)
    errs = []

    def publish(updates):
        try:
            barrier.wait()
            cat._publish(base_v, dict(base_map), updates, max_retries=64)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=publish, args=({"a": va},))
    t2 = threading.Thread(target=publish, args=({"b": vb},))
    t1.start(), t2.start(), t1.join(), t2.join()
    assert not errs
    final = cat.mapping()
    assert final["a"] == va and final["b"] == vb
    assert _vals(cat.read(spark, "a")) == [10, 11]
    assert _vals(cat.read(spark, "b")) == [20, 21, 22]


def test_overlapping_concurrent_commit_conflicts(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat3"))
    cat.commit({"t": _ids(spark, 0, 2)})
    base_v = cat.current_version()
    base_map = cat.mapping(base_v)
    # txn A publishes t
    va = write_snapshot(_ids(spark, 10, 11), cat.table_path("t"))
    cat._publish(base_v, dict(base_map), {"t": va}, max_retries=8)
    # txn B also started at base_v and touches the SAME table
    vb = write_snapshot(_ids(spark, 20, 21), cat.table_path("t"))
    with pytest.raises(CatalogConflict):
        cat._publish(base_v, dict(base_map), {"t": vb}, max_retries=8)
    # the conflicting write never became visible
    assert _vals(cat.read(spark, "t")) == [10]


def test_vacuum_drops_unreferenced_versions_keeps_live(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat4"))
    cat.commit({"t": _ids(spark, 0, 2)})
    cat.commit({"t": _ids(spark, 10, 12)})
    # crashed-txn orphan that no catalog references (and is older
    # than the table pointer once the next commit lands)
    write_snapshot(_ids(spark, 90, 91), cat.table_path("t"))
    v3 = cat.commit({"t": _ids(spark, 20, 22)})
    dropped = cat.vacuum_unreferenced(keep_last=1, grace_seconds=0)
    assert set(dropped["t"]) == {1, 2, 3}  # v1, v2, the orphan
    assert cat.versions() == [v3]
    assert _vals(cat.read(spark, "t")) == [20, 21]
    # direct (non-catalog) read of the table still works
    from enclaveid_data_pipeline_spark.sources.layout import read_snapshot

    assert _vals(read_snapshot(spark, cat.table_path("t"))) == [20, 21]


def test_read_unknown_table_raises(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat5"))
    cat.commit({"t": _ids(spark, 0, 1)})
    with pytest.raises(KeyError):
        cat.read(spark, "nope")


def test_commit_with_stats_cols_writes_zone_maps(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat6"))
    cat.commit(
        {"t": _ids(spark, 0, 100)}, stats_cols={"t": ["id"]}
    )
    v = cat.mapping()["t"]
    stats = os.path.join(
        cat.be.data_dir(cat.table_path("t"), v), "_file_stats.json"
    )
    assert os.path.exists(stats)


def test_six_disjoint_writers_all_land(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat7"))
    names = [f"t{i}" for i in range(6)]
    cat.commit({n: _ids(spark, 0, 1) for n in names})
    written = {
        n: write_snapshot(_ids(spark, 10 * i, 10 * i + 2), cat.table_path(n))
        for i, n in enumerate(names)
    }
    base_v = cat.current_version()
    base_map = cat.mapping(base_v)
    barrier = threading.Barrier(6)
    errs = []

    def publish(n):
        try:
            barrier.wait()
            cat._publish(base_v, dict(base_map), {n: written[n]}, 128)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=publish, args=(n,)) for n in names]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    final = cat.mapping()
    assert {n: final[n] for n in names} == written
    # six publishes landed (claim numbers may be sparse: a loser
    # whose ref CAS raced out burns its claimed number — vacuumable)
    assert cat.current_version() > base_v
    head_parents = set()
    v = cat.current_version()
    while v is not None:
        head_parents.add(v)
        v = cat._payload(v)["parent"]
    assert base_v in head_parents and len(head_parents) >= 7


def test_branch_commit_invisible_to_main_then_fast_forward(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "br1"))
    v1 = cat.commit({"t": _ids(spark, 0, 3)})
    cat.create_branch("dev")
    b1 = cat.commit({"t": _ids(spark, 10, 12)}, branch="dev")
    b2 = cat.commit({"u": _ids(spark, 20, 21)}, branch="dev")
    # main untouched by branch commits
    assert cat.current_version() == v1
    assert _vals(cat.read(spark, "t")) == [0, 1, 2]
    assert cat.branch_head("dev") == b2
    assert _vals(cat.read(spark, "t", catalog_version=b2)) == [10, 11]
    # main never moved -> fast-forward
    merged = cat.merge_branch("dev")
    assert merged == b2
    assert cat.current_version() == b2
    assert _vals(cat.read(spark, "t")) == [10, 11]
    assert _vals(cat.read(spark, "u")) == [20]


def test_three_way_merge_disjoint_and_conflict(spark, tmp_path):
    from enclaveid_data_pipeline_spark.sources.catalog import MergeConflict

    cat = SnapshotCatalog(str(tmp_path / "br2"))
    cat.commit({"a": _ids(spark, 0, 1), "b": _ids(spark, 0, 1)})
    cat.create_branch("dev")
    cat.commit({"a": _ids(spark, 10, 12)}, branch="dev")  # branch: a
    cat.commit({"b": _ids(spark, 20, 23)})  # main: b
    merged = cat.merge_branch("dev")
    # three-way result: branch's a + main's b
    assert _vals(cat.read(spark, "a", catalog_version=merged)) == [10, 11]
    assert _vals(cat.read(spark, "b", catalog_version=merged)) == [
        20,
        21,
        22,
    ]
    meta = cat.commit_meta(merged)
    assert meta["merged_from"] == "dev"

    # both sides touch the SAME table -> conflict
    cat.create_branch("dev2")
    cat.commit({"a": _ids(spark, 30, 31)}, branch="dev2")
    cat.commit({"a": _ids(spark, 40, 41)})  # main moves a too
    with pytest.raises(MergeConflict):
        cat.merge_branch("dev2")


def test_branch_same_ref_rivals_conflict_or_rebase(spark, tmp_path):
    from enclaveid_data_pipeline_spark.sources.catalog import (
        CatalogConflict,
    )

    cat = SnapshotCatalog(str(tmp_path / "br3"))
    cat.commit({"t": _ids(spark, 0, 1), "u": _ids(spark, 0, 1)})
    cat.create_branch("dev")
    base = cat.branch_head("dev")
    base_map = cat.mapping(base)
    # rival A lands t on the branch
    va = write_snapshot(_ids(spark, 10, 11), cat.table_path("t"))
    cat._publish_to_ref("dev", base, dict(base_map), {"t": va}, 8)
    # rival B from the same base: overlapping table -> conflict
    vb = write_snapshot(_ids(spark, 20, 21), cat.table_path("t"))
    with pytest.raises(CatalogConflict):
        cat._publish_to_ref("dev", base, dict(base_map), {"t": vb}, 8)
    # disjoint table from the same stale base -> rebases and lands
    vu = write_snapshot(_ids(spark, 30, 33), cat.table_path("u"))
    cat._publish_to_ref("dev", base, dict(base_map), {"u": vu}, 8)
    head_map = cat.mapping(cat.branch_head("dev"))
    assert head_map["t"] == va and head_map["u"] == vu


def test_vacuum_retains_branch_heads(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "br4"))
    cat.commit({"t": _ids(spark, 0, 2)})
    cat.create_branch("dev")
    cat.commit({"t": _ids(spark, 10, 12)}, branch="dev")
    bh = cat.branch_head("dev")
    # main races ahead with higher-numbered versions
    for lo in (20, 30, 40):
        cat.commit({"t": _ids(spark, lo, lo + 2)})
    cat.vacuum_unreferenced(keep_last=1)
    # the parked branch head and its table version survived
    assert cat.branch_head("dev") == bh
    assert _vals(cat.read(spark, "t", catalog_version=bh)) == [10, 11]
    assert _vals(cat.read(spark, "t")) == [40, 41]


def test_tags_and_timestamp_as_of(spark, tmp_path):
    from enclaveid_data_pipeline_spark.sources.catalog import (
        CatalogConflict,
    )

    cat = SnapshotCatalog(str(tmp_path / "tags"))
    v1 = cat.commit({"t": _ids(spark, 0, 2)})
    t1 = cat.commit_meta(v1)["committed_at"]
    cat.create_tag("rel-1.0")
    v2 = cat.commit({"t": _ids(spark, 10, 12)})
    # tag pins v1 forever
    assert cat.tag_version("rel-1.0") == v1
    assert _vals(
        cat.read(spark, "t", catalog_version=cat.tag_version("rel-1.0"))
    ) == [0, 1]
    # tags are immutable: no committing to them, no duplicates
    with pytest.raises(ValueError):
        cat.commit({"t": _ids(spark, 0, 1)}, branch="tag-rel-1.0")
    with pytest.raises(CatalogConflict):
        cat.create_tag("rel-1.0")
    with pytest.raises(ValueError):
        cat.create_branch("main")
    # timestamp time travel on the main chain
    assert cat.version_as_of(t1) == v1
    assert cat.version_as_of("9999-01-01") == v2
    assert cat.version_as_of("1970-01-01") is None
    # tagged version survives vacuum even after main races ahead
    cat.commit({"t": _ids(spark, 20, 22)})
    cat.vacuum_unreferenced(keep_last=1)
    assert _vals(
        cat.read(spark, "t", catalog_version=cat.tag_version("rel-1.0"))
    ) == [0, 1]


def test_branch_disjoint_threaded_rivals_both_land(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "br5"))
    cat.commit({"a": _ids(spark, 0, 1), "b": _ids(spark, 0, 1)})
    cat.create_branch("dev")
    base = cat.branch_head("dev")
    base_map = cat.mapping(base)
    va = write_snapshot(_ids(spark, 10, 12), cat.table_path("a"))
    vb = write_snapshot(_ids(spark, 20, 23), cat.table_path("b"))
    barrier = threading.Barrier(2)
    errs = []

    def publish(updates):
        try:
            barrier.wait()
            cat._publish_to_ref("dev", base, dict(base_map), updates, 64)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=publish, args=({"a": va},))
    t2 = threading.Thread(target=publish, args=({"b": vb},))
    t1.start(), t2.start(), t1.join(), t2.join()
    assert not errs
    head_map = cat.mapping(cat.branch_head("dev"))
    assert head_map["a"] == va and head_map["b"] == vb
    # main untouched by the whole race
    assert cat.mapping()["a"] != va


def test_remerge_is_idempotent_not_conflicting(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "br6"))
    cat.commit({"a": _ids(spark, 0, 1), "b": _ids(spark, 0, 1)})
    cat.create_branch("dev")
    cat.commit({"a": _ids(spark, 10, 12)}, branch="dev")
    cat.commit({"b": _ids(spark, 20, 21)})  # force three-way
    m1 = cat.merge_branch("dev")
    assert cat.mapping(m1)["a"] == cat.mapping(cat.branch_head("dev"))["a"]
    # merging the unchanged branch again: both sides already hold the
    # branch's version of a — no conflict, no new commit
    m2 = cat.merge_branch("dev")
    assert m2 == m1
    assert cat.current_version() == m1


def test_catalog_read_pruned_with_bloom(spark, tmp_path):
    """Round 8: the catalog commit maintains zone maps AND bloom
    indexes transactionally (stats_cols / bloom_cols per table), and
    read_pruned serves point lookups with metadata-only file
    skipping at the catalog-pinned version — results identical to
    the unpruned read + filter."""
    from enclaveid_data_pipeline_spark.sources.catalog import SnapshotCatalog
    from enclaveid_data_pipeline_spark.sources.layout import pruned_files

    cat = SnapshotCatalog(str(tmp_path / "rp_cat"))
    df = (
        spark.range(6_000)
        .selectExpr("id % 600 AS user_id", "id % 3 AS v")
        .repartition(12, "user_id")
    )
    v1 = cat.commit(
        {"events": df},
        stats_cols={"events": ["user_id"]},
        bloom_cols={"events": ["user_id"]},
    )
    got = cat.read_pruned(spark, "events", [("user_id", "==", 77)])
    assert got.count() == 10
    files, total = pruned_files(
        cat.table_path("events"), [("user_id", "==", 77)], backend=cat.be
    )
    assert len(files) <= 2 < total == 12

    # version pinning: a later commit rewrites the table; reading at
    # v1 still prunes against v1's manifest
    cat.commit(
        {"events": df.filter("user_id <> 77")},
        stats_cols={"events": ["user_id"]},
        bloom_cols={"events": ["user_id"]},
    )
    assert cat.read_pruned(
        spark, "events", [("user_id", "==", 77)], catalog_version=v1
    ).count() == 10
    assert cat.read_pruned(spark, "events", [("user_id", "==", 77)]).count() == 0

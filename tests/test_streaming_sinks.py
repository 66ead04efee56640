"""foreachBatch partition-upsert sink: merge mode accumulates across
micro-batches touching the same partition and replaces replayed rows
by key; rewrite mode pins the batch-complete contract (partition
content = this batch)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.streaming.sessions import (
    read_event_stream,
)
from enclaveid_data_pipeline_spark.streaming.sinks import (
    partition_upsert_sink,
)


def _drop(spark, tmp_path, stream_dir, name, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string"
    ).select(
        "event_id",
        # μs NTZ, like the current corpus layout
        F.timestamp_micros("ts_us").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    staging = tmp_path / "staging" / name
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    part = next(staging.glob("part-*.parquet"))
    shutil.copy(part, stream_dir / f"events-{name}.parquet")


BASE = 1_700_000_000_000_000


def test_merge_mode_accumulates_across_batches_and_dedups_replay(
    spark, tmp_path
):
    """THE data-loss case the rewrite default had: one partition key
    (user 7) spans two micro-batches. Merge mode keeps batch-1 rows
    when batch 2 lands, and a full replay (new query, no checkpoint)
    replaces rows by event_id instead of duplicating or dropping."""
    stream_dir = tmp_path / "sink_in"
    stream_dir.mkdir()
    out = str(tmp_path / "sink_out")

    q = partition_upsert_sink(
        read_event_stream(spark, str(stream_dir)).select(
            "user_id", "event_id", "ts", "event_type"
        ),
        out,
    )
    try:
        _drop(spark, tmp_path, stream_dir, "000", [(1, BASE, 7, "click")])
        q.processAllAvailable()
        _drop(
            spark, tmp_path, stream_dir, "001",
            [(2, BASE + 10, 7, "view"), (3, BASE + 20, 8, "click")],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        r.event_id: (r.user_id, r.event_type)
        for r in spark.read.parquet(out).collect()
    }
    # user 7 has BOTH batches' rows — no partition-rewrite loss
    assert rows == {1: (7, "click"), 2: (7, "view"), 3: (8, "click")}

    # uncommitted-checkpoint replay: new query re-reads everything
    q2 = partition_upsert_sink(
        read_event_stream(spark, str(stream_dir)).select(
            "user_id", "event_id", "ts", "event_type"
        ),
        out,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    replayed = spark.read.parquet(out)
    assert replayed.count() == 3  # replaced by key, not duplicated


def test_rewrite_mode_pins_partition_equals_batch(spark, tmp_path):
    """Explicit rewrite mode: the second batch REPLACES user 7's
    partition — the documented batch-complete contract (and exactly
    why it is no longer the default for raw event streams)."""
    stream_dir = tmp_path / "sink_in_rw"
    stream_dir.mkdir()
    out = str(tmp_path / "sink_out_rw")

    q = partition_upsert_sink(
        read_event_stream(spark, str(stream_dir)).select(
            "user_id", "event_id", "ts"
        ),
        out,
        mode="rewrite",
    )
    try:
        _drop(spark, tmp_path, stream_dir, "000", [(1, BASE, 7, "click")])
        q.processAllAvailable()
        _drop(spark, tmp_path, stream_dir, "001", [(2, BASE + 10, 7, "view")])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(out).collect()
    assert [(r.event_id, r.user_id) for r in rows] == [(2, 7)]


def test_merge_mode_requires_merge_keys_in_frame(spark, tmp_path):
    """A frame without the merge identity fails loudly at the first
    batch instead of silently corrupting."""
    stream_dir = tmp_path / "sink_in_nk"
    stream_dir.mkdir()
    out = str(tmp_path / "sink_out_nk")

    q = partition_upsert_sink(
        read_event_stream(spark, str(stream_dir)).select("user_id", "ts"),
        out,
    )
    try:
        _drop(spark, tmp_path, stream_dir, "000", [(1, BASE, 7, "click")])
        with pytest.raises(Exception, match="merge_keys"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_transform_runs_per_batch(spark, tmp_path):
    stream_dir = tmp_path / "sink_in2"
    stream_dir.mkdir()
    out = str(tmp_path / "sink_out2")

    stream = read_event_stream(spark, str(stream_dir))
    q = partition_upsert_sink(
        stream,
        out,
        transform=lambda b: b.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n")
        ),
        mode="rewrite",  # per-batch aggregate IS partition-complete
    )
    try:
        _drop(
            spark, tmp_path, stream_dir, "000",
            [(1, BASE, 7, "click"), (2, BASE + 1, 7, "view")],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(out).collect()
    assert [(r.user_id, r.n) for r in rows] == [(7, 2)]


def test_rollup_sink_folds_batches_and_skips_replay(spark, tmp_path):
    """The rollup table after two micro-batches equals the one-shot
    rollup of all rows (merge == full recompute, streamed), and a
    full no-checkpoint replay folds nothing twice (batch-id guard)."""
    from enclaveid_data_pipeline_spark.operators.rollup import (
        rollup_partials,
    )
    from enclaveid_data_pipeline_spark.streaming.sinks import rollup_sink

    stream_dir = tmp_path / "roll_in"
    stream_dir.mkdir()
    out = str(tmp_path / "roll_out")
    keys = ("user_id",)
    measures = {
        "total": ("sum", "value"),
        "n": ("count", "*"),
        "first_us": ("min", "ts"),
    }

    def start():
        return rollup_sink(
            read_event_stream(spark, str(stream_dir)).select(
                "user_id", "value", "ts"
            ),
            out,
            keys,
            measures,
        )

    b1 = [(1, BASE, 7, "click"), (2, BASE + 10, 7, "view"), (3, BASE, 9, "click")]
    b2 = [(4, BASE + 20, 7, "click"), (5, BASE + 5, 11, "view")]
    q = start()
    try:
        _drop(spark, tmp_path, stream_dir, "000", b1)
        q.processAllAvailable()
        _drop(spark, tmp_path, stream_dir, "001", b2)
        q.processAllAvailable()
    finally:
        q.stop()

    def snap():
        return {
            r.user_id: (r.total, r.n, r.first_us)
            for r in spark.read.parquet(out).collect()
        }

    got = snap()
    all_rows = spark.createDataFrame(
        b1 + b2, "event_id long, ts_us long, user_id long, event_type string"
    ).select(
        "user_id",
        F.lit(1.0).alias("value"),
        F.timestamp_micros("ts_us").cast("timestamp_ntz").alias("ts"),
    )
    want = {
        r.user_id: (r.total, r.n, r.first_us)
        for r in rollup_partials(all_rows, keys, measures).collect()
    }
    assert got == want and got[7][1] == 3

    # replay: fresh query, no checkpoint, same inputs -> same table
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert snap() == want


def _drop_changes(spark, tmp_path, stream_dir, name, rows):
    """rows: (seq, user_id, value, op). One stream change-file."""
    df = spark.createDataFrame(
        rows, "seq long, user_id long, value double, op string"
    )
    staging = tmp_path / "staging" / f"cdc{name}"
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    part = next(staging.glob("part-*.parquet"))
    shutil.copy(part, stream_dir / f"changes-{name}.parquet")


def test_cdc_snapshot_sink_folds_and_survives_replay(spark, tmp_path):
    """Streaming MERGE INTO: updates win by sequence (not arrival),
    tombstones delete, and a full no-checkpoint replay converges to
    the identical table because the fold is a pure max over seq."""
    from enclaveid_data_pipeline_spark.streaming.sinks import (
        cdc_snapshot_sink,
        read_cdc_snapshot,
    )

    stream_dir = tmp_path / "cdc_in"
    stream_dir.mkdir()
    out = str(tmp_path / "cdc_snap")

    def start():
        return cdc_snapshot_sink(
            spark.readStream.schema(
                "seq long, user_id long, value double, op string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir)),
            out,
            keys=("user_id",),
            seq_cols=("seq",),
        )

    q = start()
    try:
        _drop_changes(
            spark, tmp_path, stream_dir, "000",
            [(1, 7, 10.0, "U"), (2, 8, 20.0, "U")],
        )
        q.processAllAvailable()
        # batch 2: update 7, delete 8, insert 9 — plus a STALE row for
        # 7 (seq 0) that must lose to seq 3 despite arriving later
        _drop_changes(
            spark, tmp_path, stream_dir, "001",
            [(3, 7, 11.0, "U"), (4, 8, 0.0, "D"), (5, 9, 30.0, "U"),
             (0, 7, 99.0, "U")],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    live = {
        r.user_id: r.value for r in read_cdc_snapshot(spark, out).collect()
    }
    assert live == {7: 11.0, 9: 30.0}  # 8 deleted, stale 7 ignored
    # tombstone RETAINED in the stored compacted log
    stored = {r.user_id: r.op for r in spark.read.parquet(out).collect()}
    assert stored[8] == "D"

    # full replay, fresh query, no checkpoint: fold is idempotent —
    # and the retained tombstone keeps key 8 dead when its old
    # insert is re-delivered
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    live2 = {
        r.user_id: r.value for r in read_cdc_snapshot(spark, out).collect()
    }
    assert live2 == live


def test_rollup_sink_maintains_kll_quantiles(spark, tmp_path):
    """Quantile sketches fold through the streaming rollup sink: the
    maintained median tracks the exact percentile of all streamed
    rows — incremental percentiles with the corpus never re-scanned."""
    from enclaveid_data_pipeline_spark.operators.rollup import with_quantile
    from enclaveid_data_pipeline_spark.streaming.sinks import rollup_sink

    stream_dir = tmp_path / "kll_in"
    stream_dir.mkdir()
    out = str(tmp_path / "kll_out")
    keys = ("user_id",)
    measures = {"q": ("kll", "value"), "n": ("count", "*")}

    q = rollup_sink(
        read_event_stream(spark, str(stream_dir)).select(
            "user_id", "event_id"
        ),
        out,
        keys,
        measures,
        # value = event_id → streamed values are exactly 0..199
        transform=lambda b: b.withColumn(
            "value", F.col("event_id").cast("double")
        ),
    )
    # two drops: user 7 gets values 0..199 split across batches
    b1 = [(i, BASE + i, 7, "click") for i in range(100)]
    b2 = [(i + 100, BASE + i + 100, 7, "click") for i in range(100)]
    try:
        _drop(spark, tmp_path, stream_dir, "000", b1)
        q.processAllAvailable()
        _drop(spark, tmp_path, stream_dir, "001", b2)
        q.processAllAvailable()
    finally:
        q.stop()

    snap = spark.read.parquet(out)
    row = with_quantile(snap, "med", "q", 0.5).collect()[0]
    assert row.n == 200
    # exact median of 0..199 is 99.5; KLL at n=200 is exact (below
    # sketch compaction), but allow its documented rank slack anyway
    assert abs(row.med - 99.5) <= 4


def test_cms_sink_maintains_sketch_across_batches(spark, tmp_path):
    """The streamed sketch after two micro-batches equals the batch
    sketch of all rows (counter addition == one-shot build), its
    estimates bound the true counts from above, and a full
    no-checkpoint replay folds nothing twice."""
    from enclaveid_data_pipeline_spark.operators.sketch import (
        count_min_estimate,
        count_min_table,
    )
    from enclaveid_data_pipeline_spark.streaming.sinks import cms_sink

    stream_dir = tmp_path / "cms_in"
    stream_dir.mkdir()
    out = str(tmp_path / "cms_out")

    def start():
        return cms_sink(
            read_event_stream(spark, str(stream_dir)).select("event_type"),
            out,
            item_col="event_type",
        )

    b1 = [(i, BASE + i, 1, "click") for i in range(6)] + [
        (10, BASE, 2, "view")
    ]
    b2 = [(20 + i, BASE + i, 3, "click") for i in range(4)] + [
        (30, BASE, 4, "purchase")
    ]
    q = start()
    try:
        _drop(spark, tmp_path, stream_dir, "c000", b1)
        q.processAllAvailable()
        _drop(spark, tmp_path, stream_dir, "c001", b2)
        q.processAllAvailable()
    finally:
        q.stop()

    def grid():
        return {
            (r.row, r.bucket): r.n
            for r in spark.read.parquet(out).drop("_batch_id").collect()
        }

    got = grid()
    all_items = spark.createDataFrame(
        [("click",)] * 10 + [("view",)] * 1 + [("purchase",)] * 1,
        "item string",
    )
    want = {
        (r.row, r.bucket): r.n
        for r in count_min_table(all_items).collect()
    }
    assert got == want

    # estimates ≥ truth through the persisted grid
    probes = spark.createDataFrame(
        [("click", 10), ("view", 1), ("purchase", 1)], "item string, t long"
    )
    sketch = spark.read.parquet(out).drop("_batch_id")
    est = {
        r.item: r.cms_est
        for r in count_min_estimate(probes, sketch).collect()
    }
    assert est["click"] >= 10 and est["view"] >= 1

    # replay with no checkpoint: batch-id guard keeps counters exact
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert grid() == want


def test_retraction_view_sink_applies_updates_and_deletes(spark, tmp_path):
    """Stream change images through the retraction sink: after two
    micro-batches the view equals the direct aggregate of the final
    state — including an update that moves a row between groups and
    a delete that empties a group — and a replayed batch id folds
    nothing twice."""
    from enclaveid_data_pipeline_spark.streaming.sinks import (
        retraction_view_sink,
    )

    stream_dir = tmp_path / "cdf_in"
    stream_dir.mkdir()
    out = str(tmp_path / "cdf_view")
    schema = "k int, g string, v long, change_type string"

    def drop(name, rows):
        staging = tmp_path / "stage" / name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"changes-{name}.parquet")

    def start():
        return retraction_view_sink(
            spark.readStream.schema(schema).parquet(str(stream_dir)),
            out,
            group_keys=("g",),
            sum_cols=("v",),
        )

    # state after b1: k1(g1,10), k2(g1,20), k3(g2,30)
    b1 = [
        (1, "g1", 10, "insert"),
        (2, "g1", 20, "insert"),
        (3, "g2", 30, "insert"),
    ]
    # b2: k2 value 20->25, k3 moves g2->g3 (empties g2), k1 deleted
    b2 = [
        (2, "g1", 20, "update_pre"),
        (2, "g1", 25, "update_post"),
        (3, "g2", 30, "update_pre"),
        (3, "g3", 30, "update_post"),
        (1, "g1", 10, "delete"),
    ]
    q = start()
    try:
        drop("000", b1)
        q.processAllAvailable()
        drop("001", b2)
        q.processAllAvailable()
    finally:
        q.stop()

    def snap():
        return {
            r.g: (r.v, r.n_rows)
            for r in spark.read.parquet(out).collect()
        }

    want = {"g1": (25, 1), "g3": (30, 1)}
    assert snap() == want

    # full no-checkpoint replay re-delivers batch ids 0 and 1: the
    # guard must fold nothing twice
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert snap() == want


def test_versioned_snapshot_sink_commits_versions_with_history(spark, tmp_path):
    """Each micro-batch commits a time-travelable snapshot version:
    upserts and tombstones fold per key, pre-states stay readable,
    snapshot_changes reconstructs what the stream changed, zone maps
    refresh per commit, and a no-checkpoint replay (all batch ids
    redelivered) folds nothing twice."""
    from enclaveid_data_pipeline_spark.sources.layout import (
        current_snapshot,
        pruned_files,
        read_commit_meta,
        read_snapshot,
        snapshot_changes,
    )
    from enclaveid_data_pipeline_spark.streaming.sinks import (
        versioned_snapshot_sink,
    )

    stream_dir = tmp_path / "ver_in"
    stream_dir.mkdir()
    out = str(tmp_path / "ver_table")
    schema = "k int, v long, seq long, op string"

    def drop(name, rows):
        staging = tmp_path / "vstage" / name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"b-{name}.parquet")

    def start(ckpt):
        return versioned_snapshot_sink(
            spark.readStream.schema(schema).parquet(str(stream_dir)),
            out,
            keys=("k",),
            seq_cols=("seq",),
            op_col="op",
            stats_cols=("k",),
            checkpoint_dir=str(tmp_path / ckpt),
        )

    b1 = [(1, 10, 1, "U"), (2, 20, 2, "U")]
    b2 = [(1, 11, 3, "U"), (2, 0, 4, "D"), (3, 30, 5, "U")]
    q = start("ck1")
    try:
        drop("000", b1)
        q.processAllAvailable()
        drop("001", b2)
        q.processAllAvailable()
    finally:
        q.stop()

    assert current_snapshot(out) == 2
    cur = {r.k: r.v for r in read_snapshot(spark, out).collect()}
    assert cur == {1: 11, 3: 30}  # k2 tombstoned, k1 updated, k3 new
    v1 = {r.k: r.v for r in read_snapshot(spark, out, version=1).collect()}
    assert v1 == {1: 10, 2: 20}  # pre-state intact (time travel)
    feed = snapshot_changes(spark, out, 1, 2, keys=["k"])
    got = {(r.k, r.change_type) for r in feed.collect()}
    assert got == {
        (1, "update_pre"), (1, "update_post"),
        (2, "delete"), (3, "insert"),
    }
    # zone maps refreshed at the latest commit
    files, total = pruned_files(out, [("k", "==", 3)])
    assert len(files) <= total
    assert read_commit_meta(out)["batch_id"] == 1

    # full replay with a FRESH checkpoint: every batch id redelivered,
    # nothing folds twice (versions unchanged, table identical)
    q2 = start("ck2")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert current_snapshot(out) == 2
    assert {r.k: r.v for r in read_snapshot(spark, out).collect()} == cur


def test_catalog_txn_sink_multi_table_exactly_once(spark, tmp_path):
    """Each micro-batch publishes the appended fact table AND its
    per-key rollup in ONE atomic catalog transaction: every catalog
    version's rollup equals a recompute from that version's fact
    (cross-table consistency at every point in history), and a
    no-checkpoint replay folds nothing twice — the batch-id guard
    lives on the catalog, one guard for the whole transaction."""
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.sources.catalog import (
        SnapshotCatalog,
    )
    from enclaveid_data_pipeline_spark.streaming.sinks import (
        catalog_txn_sink,
    )

    stream_dir = tmp_path / "txn_in"
    stream_dir.mkdir()
    cat = SnapshotCatalog(str(tmp_path / "txn_cat"))
    schema = "k int, amount long"

    def drop(name, rows):
        staging = tmp_path / "tstage" / name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"b-{name}.parquet")

    def build(batch_df, current):
        fact = (
            current["fact"].unionByName(batch_df)
            if "fact" in current
            else batch_df
        )
        rollup = fact.groupBy("k").agg(
            F.sum("amount").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        return {"fact": fact, "rollup": rollup}

    def start(ckpt):
        return catalog_txn_sink(
            spark.readStream.schema(schema).parquet(str(stream_dir)),
            cat,
            build,
            checkpoint_dir=str(tmp_path / ckpt),
        )

    q = start("ck1")
    try:
        drop("000", [(1, 10), (2, 20)])
        q.processAllAvailable()
        drop("001", [(1, 5), (3, 7)])
        q.processAllAvailable()
    finally:
        q.stop()

    assert cat.current_version() == 2
    # every catalog version is cross-table consistent: rollup ==
    # recompute from the SAME version's fact
    for cv in cat.versions():
        fact = cat.read(spark, "fact", catalog_version=cv)
        rollup = {
            r.k: (r.total, r.n)
            for r in cat.read(spark, "rollup", catalog_version=cv).collect()
        }
        truth = {
            r.k: (r.total, r.n)
            for r in fact.groupBy("k")
            .agg(F.sum("amount").alias("total"), F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert rollup == truth, cv
    assert {
        r.k: r.total
        for r in cat.read(spark, "rollup").collect()
    } == {1: 15, 2: 20, 3: 7}

    # full replay with a FRESH checkpoint: both batches redeliver,
    # the catalog batch-id guard skips them jointly
    q2 = start("ck2")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert cat.current_version() == 2
    assert cat.read(spark, "fact").count() == 4


def test_catalog_txn_sink_streams_into_branch_then_merge(spark, tmp_path):
    """Streaming WAP at catalog granularity: micro-batches accumulate
    on a branch (main readers see nothing), one merge exposes the
    whole ingest window atomically, and a branch restream with a
    fresh checkpoint folds nothing twice."""
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.sources.catalog import (
        SnapshotCatalog,
    )
    from enclaveid_data_pipeline_spark.streaming.sinks import (
        catalog_txn_sink,
    )

    stream_dir = tmp_path / "br_in"
    stream_dir.mkdir()
    cat = SnapshotCatalog(str(tmp_path / "br_cat"))
    schema = "k int, amount long"
    seed = cat.commit(
        {"fact": spark.createDataFrame([(0, 1)], schema)}
    )

    def drop(name, rows):
        staging = tmp_path / "brstage" / name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"b-{name}.parquet")

    def build(batch_df, current):
        fact = (
            current["fact"].unionByName(batch_df)
            if "fact" in current
            else batch_df
        )
        rollup = fact.groupBy("k").agg(F.sum("amount").alias("total"))
        return {"fact": fact, "rollup": rollup}

    def start(ckpt):
        return catalog_txn_sink(
            spark.readStream.schema(schema).parquet(str(stream_dir)),
            cat,
            build,
            checkpoint_dir=str(tmp_path / ckpt),
            branch="ingest",
        )

    q = start("bck1")
    try:
        drop("000", [(1, 10)])
        q.processAllAvailable()
        drop("001", [(1, 5), (2, 7)])
        q.processAllAvailable()
    finally:
        q.stop()

    # main never moved; the branch holds the folded state
    assert cat.current_version() == seed
    assert "rollup" not in cat.mapping()
    bh = cat.branch_head("ingest")
    assert {
        r.k: r.total
        for r in cat.read(spark, "rollup", catalog_version=bh).collect()
    } == {0: 1, 1: 15, 2: 7}

    # publish: one merge exposes fact+rollup to main atomically
    cat.merge_branch("ingest")
    assert {
        r.k: r.total for r in cat.read(spark, "rollup").collect()
    } == {0: 1, 1: 15, 2: 7}

    # branch restream from a fresh checkpoint folds nothing twice
    q2 = start("bck2")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert cat.branch_head("ingest") == bh
    assert cat.read(spark, "fact", catalog_version=bh).count() == 4


def test_catalog_txn_sink_crash_between_tables_and_publish(spark, tmp_path):
    """Crash injection: the transaction dies AFTER its table
    snapshots land but BEFORE the catalog publish. Catalog readers
    never see the torn state (both tables stay at the previous
    version), and a restart re-folds the batch cleanly — the orphan
    table versions are inert and vacuumable."""
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.sources.catalog import (
        SnapshotCatalog,
    )
    from enclaveid_data_pipeline_spark.streaming.sinks import (
        catalog_txn_sink,
    )

    stream_dir = tmp_path / "crash_in"
    stream_dir.mkdir()
    cat = SnapshotCatalog(str(tmp_path / "crash_cat"))
    schema = "k int, amount long"
    cat.commit(
        {
            "fact": spark.createDataFrame([(0, 1)], schema),
            "rollup": spark.createDataFrame(
                [(0, 1, 1)], "k int, total long, n long"
            ),
        }
    )
    v0 = cat.current_version()

    def drop(name, rows):
        staging = tmp_path / "cstage" / name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"b-{name}.parquet")

    def build(batch_df, current):
        fact = current["fact"].unionByName(batch_df)
        rollup = fact.groupBy("k").agg(
            F.sum("amount").alias("total"), F.count(F.lit(1)).alias("n")
        )
        return {"fact": fact, "rollup": rollup}

    # crash injection: tables write, catalog publish dies
    real_publish = cat._publish_to_ref

    def dying_publish(*a, **kw):
        raise RuntimeError("injected crash before catalog publish")

    cat._publish_to_ref = dying_publish
    drop("000", [(1, 10), (2, 20)])
    q = catalog_txn_sink(
        spark.readStream.schema(schema).parquet(str(stream_dir)),
        cat,
        build,
        checkpoint_dir=str(tmp_path / "cck1"),
    )
    try:
        with pytest.raises(Exception):
            q.processAllAvailable()
    finally:
        q.stop()
    # torn state invisible: catalog still serves the v0 pair
    assert cat.current_version() == v0
    assert cat.read(spark, "fact").count() == 1
    assert cat.read(spark, "rollup").count() == 1

    # restart with the publish healed: the SAME batch re-folds once
    cat._publish_to_ref = real_publish
    q2 = catalog_txn_sink(
        spark.readStream.schema(schema).parquet(str(stream_dir)),
        cat,
        build,
        checkpoint_dir=str(tmp_path / "cck2"),
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert {
        r.k: r.total for r in cat.read(spark, "rollup").collect()
    } == {0: 1, 1: 10, 2: 20}
    assert cat.read(spark, "fact").count() == 3
    # the crashed attempt's orphan table versions are reclaimable
    dropped = cat.vacuum_unreferenced(keep_last=2, grace_seconds=0)
    assert dropped  # at least the orphans went
    assert cat.read(spark, "fact").count() == 3


def test_versioned_snapshot_sink_replay_after_interleaved_dml(
    spark, tmp_path
):
    """Round-6 advice: a redelivered batch must skip even when the
    HEAD is no longer the stream's own commit. Crash window: stream
    commits batch 1, checkpoint write dies, a DML (DELETE) commits a
    new head whose meta is not the stream's — the old head-only
    guard would refold batch 1 here. The per-stream cursor folds
    forward through the DML's commit, so the replay skips and the
    DML's effect survives."""
    from enclaveid_data_pipeline_spark.sources.layout import (
        current_snapshot,
        delete_where,
        read_commit_meta,
        read_snapshot,
        stream_batch_id,
    )
    from enclaveid_data_pipeline_spark.streaming.sinks import (
        versioned_snapshot_sink,
    )

    stream_dir = tmp_path / "idml_in"
    stream_dir.mkdir()
    out = str(tmp_path / "idml_table")
    schema = "k int, v long, seq long"

    def drop(name, rows):
        staging = tmp_path / "idmlstage" / name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"b-{name}.parquet")

    def start(ckpt):
        return versioned_snapshot_sink(
            spark.readStream.schema(schema).parquet(str(stream_dir)),
            out,
            keys=("k",),
            seq_cols=("seq",),
            checkpoint_dir=str(tmp_path / ckpt),
        )

    q = start("ick1")
    try:
        drop("000", [(1, 10, 1), (2, 20, 2)])
        q.processAllAvailable()
        drop("001", [(3, 30, 3)])
        q.processAllAvailable()
    finally:
        q.stop()
    assert current_snapshot(out) == 2

    # interleaved writer: DML commits version 3; its meta is NOT the
    # stream's, but the per-stream cursor folds forward through it
    delete_where(spark, out, [("k", "==", 2)])
    assert current_snapshot(out) == 3
    head_meta = read_commit_meta(out)
    assert "batch_id" not in head_meta  # head is not the stream's commit
    assert head_meta["streams"] == {"snapshot-stream": 1}
    assert stream_batch_id(out, "snapshot-stream") == 1
    assert stream_batch_id(out, "other-stream") == -1

    # fresh-checkpoint replay redelivers batch ids 0 and 1: both must
    # skip (no new versions, DML effect intact, nothing refolds)
    q2 = start("ick2")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert current_snapshot(out) == 3
    assert {r.k: r.v for r in read_snapshot(spark, out).collect()} == {
        1: 10,
        3: 30,
    }


def test_catalog_txn_sink_replay_after_interleaved_commit(spark, tmp_path):
    """Round-6 advice (the medium finding): catalog_txn_sink's
    build_tables here is APPEND-style, so a refolded batch visibly
    double-applies. Crash window: stream publishes batch 1, the
    checkpoint write dies, an unrelated writer commits a disjoint
    table — the head commit no longer carries the stream's batch id
    and the old head-only guard would refold. The per-stream cursor
    (folded forward by every commit, chain-walk backstop) must skip
    the redelivered batches."""
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.sources.catalog import SnapshotCatalog
    from enclaveid_data_pipeline_spark.streaming.sinks import catalog_txn_sink

    stream_dir = tmp_path / "icat_in"
    stream_dir.mkdir()
    cat = SnapshotCatalog(str(tmp_path / "icat_cat"))
    schema = "k int, amount long"

    def drop(name, rows):
        staging = tmp_path / "icatstage" / name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"b-{name}.parquet")

    def build(batch_df, current):
        fact = (
            current["fact"].unionByName(batch_df)
            if "fact" in current
            else batch_df
        )
        return {"fact": fact}

    def start(ckpt):
        return catalog_txn_sink(
            spark.readStream.schema(schema).parquet(str(stream_dir)),
            cat,
            build,
            checkpoint_dir=str(tmp_path / ckpt),
        )

    q = start("ick1")
    try:
        drop("000", [(1, 10), (2, 20)])
        q.processAllAvailable()
        drop("001", [(3, 30)])
        q.processAllAvailable()
    finally:
        q.stop()
    assert cat.read(spark, "fact").count() == 3

    # interleaved commit on a DISJOINT table: head meta is no longer
    # the stream's, but carries the folded-forward streams map
    cat.commit({"dim": spark.createDataFrame([(1, "a")], "k int, name string")})
    assert "batch_id" not in cat.commit_meta()
    assert cat.stream_batch_id("catalog-stream") == 1
    assert cat.stream_batch_id("never-seen") == -1

    # fresh-checkpoint replay: batches 0 and 1 redeliver; an
    # append-style refold would take fact to 6 rows — must stay 3
    head = cat.current_version()
    q2 = start("ick2")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert cat.current_version() == head
    assert cat.read(spark, "fact").count() == 3


def test_catalog_stream_batch_id_chain_walk_and_legacy(spark, tmp_path):
    """stream_batch_id resolves through the parent chain: a pre-fold
    commit carrying only a bare batch_id (legacy single-stream
    history) is honored for LEGACY_STREAM_ID only (round-7 advice: a
    NEW stream id inheriting the old cursor would silently skip its
    first batches — data loss, not a refold), and the walk never
    consults orphaned claims (it follows parent pointers only)."""
    from enclaveid_data_pipeline_spark.sources.catalog import (
        LEGACY_STREAM_ID,
        SnapshotCatalog,
    )

    cat = SnapshotCatalog(str(tmp_path / "walk_cat"))
    df = spark.createDataFrame([(1, 1)], "k int, v int")
    # legacy commit: bare batch_id, no streams map (pre-fold code).
    # Only the legacy sink id could have written it, so only that id
    # inherits the cursor — any other stream starts at -1.
    cat.commit({"t": df}, meta={"batch_id": 7})
    assert cat.stream_batch_id(LEGACY_STREAM_ID) == 7
    assert cat.stream_batch_id("any-stream") == -1
    # a streams-map commit takes precedence at the head; the fold
    # rescues the legacy cursor into the map (round-7 advice: a
    # later non-stream commit must not orphan it)
    cat.commit({"t": df}, meta={"streams": {"s1": 3}})
    assert cat.stream_batch_id("s1") == 3
    assert cat.stream_batch_id(LEGACY_STREAM_ID) == 7
    assert cat.commit_meta()["streams"] == {
        "s1": 3,
        LEGACY_STREAM_ID: 7,
    }
    # a NEW stream id walking past head maps gets -1, never the
    # legacy cursor
    assert cat.stream_batch_id("s2") == -1
    # later plain commits fold every cursor forward: O(1) at head
    cat.commit({"u": df})
    assert cat.commit_meta()["streams"] == {
        "s1": 3,
        LEGACY_STREAM_ID: 7,
    }
    assert cat.stream_batch_id("s1") == 3


def test_catalog_stream_fold_never_regresses_foreign_cursor(
    spark, tmp_path
):
    """Round-7 advice (max-merge): a writer whose own meta carries a
    STALE cursor for another stream (captured before that stream
    advanced) must not regress the folded map — per-stream max, not
    last-writer-wins."""
    from enclaveid_data_pipeline_spark.sources.catalog import SnapshotCatalog

    cat = SnapshotCatalog(str(tmp_path / "maxm_cat"))
    df = spark.createDataFrame([(1, 1)], "k int, v int")
    cat.commit({"t": df}, meta={"streams": {"a": 10}})
    # stale writer: saw a=3 long ago, also commits its own b=1
    cat.commit({"t": df}, meta={"streams": {"a": 3, "b": 1}})
    assert cat.commit_meta()["streams"] == {"a": 10, "b": 1}
    assert cat.stream_batch_id("a") == 10
    assert cat.stream_batch_id("b") == 1


def test_layout_stream_cursor_legacy_and_fold(spark, tmp_path):
    """Layout twin of the catalog legacy-cursor rules (round-7
    advice): a bare batch_id head answers only for LEGACY_STREAM_ID;
    the next commit folds it into the streams map so a DML commit
    can never orphan the cursor (pre-upgrade table + interleaved
    writers would otherwise refold on redelivery)."""
    from enclaveid_data_pipeline_spark.sources.layout import (
        LEGACY_STREAM_ID,
        read_commit_meta,
        stream_batch_id,
        write_snapshot,
    )

    out = str(tmp_path / "legacy_table")
    df = spark.createDataFrame([(1, 1)], "k int, v int")
    # pre-upgrade stream commit: bare batch_id only
    write_snapshot(df, out, commit_meta={"batch_id": 5})
    assert stream_batch_id(out, LEGACY_STREAM_ID) == 5
    assert stream_batch_id(out, "new-stream") == -1
    # a plain commit (DML/OPTIMIZE analog) folds the bare cursor
    # into the map under the legacy id — head still answers
    write_snapshot(df, out)
    meta = read_commit_meta(out)
    assert "batch_id" not in meta
    assert meta["streams"] == {LEGACY_STREAM_ID: 5}
    assert stream_batch_id(out, LEGACY_STREAM_ID) == 5
    assert stream_batch_id(out, "new-stream") == -1


def test_layout_stream_fold_max_merge_never_regresses(spark, tmp_path):
    """Layout twin of the catalog max-merge rule: a writer carrying a
    stale foreign cursor must not regress the head's newer fold."""
    from enclaveid_data_pipeline_spark.sources.layout import (
        read_commit_meta,
        write_snapshot,
    )

    out = str(tmp_path / "maxm_table")
    df = spark.createDataFrame([(1, 1)], "k int, v int")
    write_snapshot(df, out, commit_meta={"streams": {"a": 10}})
    write_snapshot(df, out, commit_meta={"streams": {"a": 3, "b": 1}})
    assert read_commit_meta(out)["streams"] == {"a": 10, "b": 1}


def test_commit_staging_retry_refolds_from_fresh_head(spark, tmp_path):
    """Round-7 advice (the high finding): _commit_staging's retry
    loop must refold from the CURRENT head plus the writer's
    ORIGINAL stream entries. The old code wrote the previous fold
    back into meta['streams'], so after a lost claim the stale fold
    overrode a cursor another stream advanced between retries —
    the head guard would then let a redelivered batch double-apply.

    Simulation: writer W (own cursor s=3) loses its first claim;
    between the attempts stream x advances its cursor 5 → 7. W's
    committed fold must carry x=7, not the stale x=5."""
    from enclaveid_data_pipeline_spark.sources.commitstore import (
        FileCommitBackend,
    )
    from enclaveid_data_pipeline_spark.sources.layout import (
        read_commit_meta,
        write_snapshot,
    )

    out = str(tmp_path / "retry_table")
    inner = FileCommitBackend()
    df = spark.createDataFrame([(1, 1)], "k int, v int")
    write_snapshot(df, out, backend=inner, commit_meta={"streams": {"x": 5}})

    class FlakyClaim:
        """Fails W's first claim and lands a rival commit (stream x
        advancing to 7) inside the window — the exact interleaving
        of a lost version race."""

        def __init__(self):
            self.failed = False

        def claim_version(self, path, cand, staging):
            if not self.failed:
                self.failed = True
                write_snapshot(
                    df, out, backend=inner, commit_meta={"streams": {"x": 7}}
                )
                return False
            return inner.claim_version(path, cand, staging)

        def __getattr__(self, name):
            return getattr(inner, name)

    write_snapshot(
        df,
        out,
        backend=FlakyClaim(),
        commit_meta={"streams": {"s": 3}},
    )
    assert read_commit_meta(out, backend=inner)["streams"] == {
        "x": 7,
        "s": 3,
    }


def test_catalog_version_as_of_vacuumed_history_returns_none(
    spark, tmp_path
):
    """Round-6 advice: a time-travel timestamp older than the oldest
    retained version must return None (honest gap), not crash with
    FileNotFoundError once vacuum dropped the history."""
    from enclaveid_data_pipeline_spark.sources.catalog import SnapshotCatalog

    cat = SnapshotCatalog(str(tmp_path / "asof_cat"))
    df = spark.createDataFrame([(1, 1)], "k int, v int")
    cat.commit({"t": df}, meta={"committed_at": "2026-01-01T00:00:00+00:00"})
    cat.commit({"t": df}, meta={"committed_at": "2026-02-01T00:00:00+00:00"})
    cat.commit({"t": df}, meta={"committed_at": "2026-03-01T00:00:00+00:00"})
    assert cat.version_as_of("2026-01-15T00:00:00+00:00") == 1
    cat.vacuum_unreferenced(keep_last=1, grace_seconds=0)
    # history below the head is gone: older-than-head ts is an
    # honest None, never a FileNotFoundError
    assert cat.version_as_of("2026-01-15T00:00:00+00:00") is None
    assert cat.version_as_of("2026-12-01T00:00:00+00:00") == 3


def test_catalog_txn_sink_maintains_star_rollup(spark, tmp_path):
    """Round 8 end-to-end: a streaming fact feed maintains a
    STAR-grain rollup (fact ⋈ dim → per-region totals) through
    catalog_txn_sink — fact append and join-aware IVM refresh
    (refresh_star_mview_incremental, batch rows as insert images)
    publish in ONE atomic catalog version per micro-batch, and the
    final rollup equals a full rebuild from the final fact state."""
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.operators.mview import (
        build_mview,
        plan_mview,
        refresh_star_mview_incremental,
    )
    from enclaveid_data_pipeline_spark.sources.catalog import SnapshotCatalog
    from enclaveid_data_pipeline_spark.streaming.sinks import catalog_txn_sink

    stream_dir = tmp_path / "star_in"
    stream_dir.mkdir()
    cat = SnapshotCatalog(str(tmp_path / "star_cat"))
    schema = "k int, cust int, cents long"
    dim_rows = [(1, "US"), (2, "US"), (3, "DE"), (4, "FR")]
    spec = plan_mview(
        ["region"], [("sum", "cents"), ("count", "cents"), ("count", "*")]
    )

    def drop(name, rows):
        staging = tmp_path / "starstage" / name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"b-{name}.parquet")

    def build(batch_df, current):
        sp = batch_df.sparkSession
        dim = sp.createDataFrame(dim_rows, "cust int, region string")
        fact = (
            current["fact"].unionByName(batch_df)
            if "fact" in current
            else batch_df
        )
        feed = batch_df.withColumn("change_type", F.lit("insert"))
        if "rollup" in current:
            rollup = refresh_star_mview_incremental(
                current["rollup"], spec, feed, dim, "cust"
            )
        else:
            rollup = build_mview(batch_df.join(dim, "cust"), spec)
        return {"fact": fact, "rollup": rollup}

    q = catalog_txn_sink(
        spark.readStream.schema(schema).parquet(str(stream_dir)),
        cat,
        build,
        checkpoint_dir=str(tmp_path / "starck"),
    )
    try:
        drop("000", [(1, 1, 100), (2, 3, 50)])
        q.processAllAvailable()
        drop("001", [(3, 3, 70), (4, 4, 30), (5, 9, 99)])  # 9: no dim
        q.processAllAvailable()
    finally:
        q.stop()

    dim = spark.createDataFrame(dim_rows, "cust int, region string")
    rebuild = build_mview(cat.read(spark, "fact").join(dim, "cust"), spec)
    got = {
        r.region: (r["sum__cents"], r["count__rows"])
        for r in cat.read(spark, "rollup").collect()
    }
    want = {
        r.region: (r["sum__cents"], r["count__rows"])
        for r in rebuild.collect()
    }
    assert got == want == {"US": (100, 1), "DE": (120, 2), "FR": (30, 1)}
    # every micro-batch was one atomic catalog version: fact and
    # rollup resolve consistently at EACH retained version
    for v in cat.versions():
        m = cat.mapping(v)
        assert ("fact" in m) == ("rollup" in m)


def test_versioned_sink_auto_optimize_failure_does_not_kill_stream(
    spark, tmp_path, monkeypatch
):
    """A failed maintenance OPTIMIZE after the batch's snapshot
    committed must not fail the trigger (review finding, round 10):
    the replay guard would skip the batch on restart and the stream
    would crash-loop while the failure persists. The sink logs and
    keeps going."""
    import enclaveid_data_pipeline_spark.sources.layout as layout
    from enclaveid_data_pipeline_spark.sources.layout import (
        read_snapshot,
    )
    from enclaveid_data_pipeline_spark.streaming.sinks import (
        versioned_snapshot_sink,
    )

    real_health = layout.snapshot_health
    monkeypatch.setattr(
        layout,
        "snapshot_health",
        lambda *a, **kw: {**real_health(*a, **kw), "needs_compaction": True},
    )

    def boom(*a, **kw):
        raise RuntimeError("simulated optimize failure")

    monkeypatch.setattr(layout, "optimize_snapshot", boom)

    stream_dir = tmp_path / "aopt_in"
    stream_dir.mkdir()
    out = str(tmp_path / "aopt_table")
    schema = "k int, v long, seq long"

    def drop(name, rows):
        staging = tmp_path / "aoptstage" / name
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, stream_dir / f"b-{name}.parquet")

    q = versioned_snapshot_sink(
        spark.readStream.schema(schema).parquet(str(stream_dir)),
        out,
        keys=("k",),
        seq_cols=("seq",),
        checkpoint_dir=str(tmp_path / "aopt_ck"),
        auto_optimize=True,
    )
    try:
        drop("000", [(1, 10, 1), (2, 20, 2)])
        q.processAllAvailable()
        assert q.isActive  # trigger survived the optimize failure
        drop("001", [(3, 30, 3)])
        q.processAllAvailable()
        assert q.isActive
    finally:
        q.stop()
    assert read_snapshot(spark, out).count() == 3

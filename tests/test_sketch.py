"""Count-min sketch properties on controlled streams."""

from __future__ import annotations

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    count_min_estimate,
    count_min_table,
)


def _stream(spark, items):
    return spark.createDataFrame([(x,) for x in items], "item string")


def test_sketch_size_bounded_and_mass_conserved(spark):
    items = [f"tok{i % 50}" for i in range(1000)]
    sk = count_min_table(_stream(spark, items))
    rows = sk.collect()
    assert len(rows) <= CMS_DEPTH * CMS_WIDTH
    # every hash row carries the full stream mass
    per_row = {}
    for r in rows:
        per_row[r["row"]] = per_row.get(r["row"], 0) + r["n"]
    assert per_row == {i: 1000 for i in range(CMS_DEPTH)}


def test_estimate_never_underestimates(spark):
    # skewed stream: token0 ×500, 200 singletons
    items = ["hot"] * 500 + [f"cold{i}" for i in range(200)]
    stream = _stream(spark, items)
    sk = count_min_table(stream)
    exact = stream.groupBy("item").agg(F.count(F.lit(1)).alias("exact_n"))
    est = count_min_estimate(exact, sk)
    bad = est.filter(F.col("cms_est") < F.col("exact_n")).count()
    assert bad == 0
    hot = est.filter(F.col("item") == "hot").collect()[0]
    # width 1024 vs 700 occurrences: collisions add ≤ a few counts
    assert hot["cms_est"] >= 500
    assert hot["cms_est"] - 500 <= 700 * CMS_DEPTH / CMS_WIDTH * 4


def test_absent_item_estimates_near_zero(spark):
    stream = _stream(spark, [f"x{i}" for i in range(100)])
    sk = count_min_table(stream)
    probes = _stream(spark, ["never-seen"])
    got = count_min_estimate(probes, sk).collect()[0]
    # min over 4 rows of mostly-empty 1024-wide grid: ~always 0
    assert got["cms_est"] <= 2


def test_estimate_preserves_probe_multiplicity_and_names(spark):
    """ADVICE r3: duplicate probe ROWS must stay duplicate in the
    output (cardinality in == cardinality out), and a probe frame
    already carrying columns named row/bucket/n must pass through
    untouched (internals are __cms_-prefixed)."""
    stream = _stream(spark, ["a"] * 5 + ["b"] * 3)
    sk = count_min_table(stream)
    probes = spark.createDataFrame(
        [("a", 1, 9, 7), ("a", 2, 9, 7), ("a", 2, 9, 7), ("b", 3, 9, 7)],
        "item string, row int, bucket int, n int",
    )
    got = count_min_estimate(probes, sk).collect()
    assert len(got) == 4
    assert sorted(r["row"] for r in got) == [1, 2, 2, 3]
    assert all(r["bucket"] == 9 and r["n"] == 7 for r in got)
    by_item = {}
    for r in got:
        by_item.setdefault(r["item"], set()).add(r["cms_est"])
    # same item → same estimate on every replica
    assert by_item["a"] == {5} and by_item["b"] == {3}


def test_merge_is_counter_addition(spark):
    a = ["a"] * 10 + ["b"] * 5
    b = ["a"] * 7 + ["c"] * 3
    sk_union = count_min_table(_stream(spark, a + b))
    sk_sum = (
        count_min_table(_stream(spark, a))
        .unionByName(count_min_table(_stream(spark, b)))
        .groupBy("row", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    assert sorted(map(tuple, sk_union.collect())) == sorted(
        map(tuple, sk_sum.collect())
    )


def test_hll_registers_merge_by_max_and_are_replay_proof(spark):
    from enclaveid_data_pipeline_spark.operators.sketch import (
        hll_registers,
    )

    a = _stream(spark, [f"u{i}" for i in range(300)])
    b = _stream(spark, [f"u{i}" for i in range(200, 500)])  # overlap
    both = _stream(spark, [f"u{i}" for i in range(500)])
    merged = (
        hll_registers(a)
        .unionByName(hll_registers(b))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    one_shot = hll_registers(both)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, one_shot.collect())
    )
    # replay: feeding the same items again changes nothing
    replay = (
        hll_registers(both)
        .unionByName(hll_registers(both))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    assert sorted(map(tuple, replay.collect())) == sorted(
        map(tuple, one_shot.collect())
    )


def test_hll_estimate_within_expected_error(spark):
    from enclaveid_data_pipeline_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    n = 2000
    items = _stream(spark, [f"key-{i}" for i in range(n)] * 3)  # dups
    est = hll_estimate(hll_registers(items)).collect()[0]["estimate"]
    # 256 registers → ~1.04/sqrt(256) ≈ 6.5% standard error; allow 4σ
    assert abs(est - n) / n < 0.26


def test_inner_product_disjoint_sketches_est_zero(spark):
    """Round-8 advice: a hash row with zero overlapping buckets must
    contribute 0 to the min, not drop out of the join — fully
    disjoint sketches returned one row with NULL est and the NULL
    propagated through the join-size gate's bound arithmetic."""
    from enclaveid_data_pipeline_spark.operators.sketch import (
        cms_inner_product,
    )

    a = count_min_table(_stream(spark, [f"left-{i}" for i in range(5)]))
    # adversarially tiny right side: one item, so most (row, bucket)
    # cells of a's sketch have no partner and at least the chance of
    # a fully-empty hash row is real; assert on the guaranteed case
    b = count_min_table(_stream(spark, []))
    row = cms_inner_product(a, b).collect()
    assert len(row) == 1
    assert row[0]["est"] == 0  # not None

    # and overlap still estimates >= truth (upper bound property)
    c = count_min_table(_stream(spark, ["x", "x", "y"]))
    d = count_min_table(_stream(spark, ["x", "z"]))
    est = cms_inner_product(c, d).collect()[0]["est"]
    assert est is not None and est >= 2  # true join size = 2·1


def test_heavy_hitters_threshold_in_plan_and_share(spark):
    """N enters the φ-threshold in-plan (same action as candidate
    counts); exactness pinned on a stream with a boundary item."""
    from enclaveid_data_pipeline_spark.operators.sketch import (
        heavy_hitters_exact,
    )

    # 100 rows: 'hot' 26 (> 25), 'edge' 25 (== φ·N, must be EXCLUDED
    # by the strict >), rest singletons
    items = ["hot"] * 26 + ["edge"] * 25 + [f"s{i}" for i in range(49)]
    out = heavy_hitters_exact(
        _stream(spark, items), item=F.col("item"), phi=0.25,
        materialize="none",
    ).collect()
    got = {r["item"]: (r["cnt"], r["share"]) for r in out}
    assert got == {"hot": (26, 0.26)}

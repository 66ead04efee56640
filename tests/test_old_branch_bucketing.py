from __future__ import annotations

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.ml.backends import (
    MockCompletionBackend,
    MockEmbeddingBackend,
)
from enclaveid_data_pipeline_spark.plans.pipeline import (
    InterestsSpec,
    build_old_branch_pipeline,
)
from enclaveid_data_pipeline_spark.sources.readers import read_table


def test_old_branch_pipeline_end_to_end(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    pipe = build_old_branch_pipeline(
        build_completion_backend=MockCompletionBackend,
        build_embedding_backend=lambda: MockEmbeddingBackend(dim=8),
        spec=InterestsSpec(
            name="general",
            first_instruction="extract interests",
            second_instruction="rephrase descriptively",
        ),
    )
    frames = pipe.run({"events": events})
    daily = frames["daily_interests"]
    rows = daily.collect()
    assert len(rows) > 0
    # distinct-per-day invariant (A4): no duplicate interests in a day
    assert all(len(r.interests) == len(set(r.interests)) for r in rows)
    emb = frames["interest_embeddings"].first()
    assert len(emb.embedding) == 8
    clusters = frames["interest_clusters"]
    labels = clusters.select("cluster_label").distinct().collect()
    assert len(labels) >= 1
    # label domain: -1 (noise) or a member interest_id
    ids = {r.interest_id for r in frames["interest_embeddings"].collect()}
    for r in clusters.collect():
        assert r.cluster_label == -1 or r.cluster_label in ids


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Bucketing proof: joining two tables bucketed on the same key
    must not shuffle — the SURVEY §7 co-located-join scale path."""
    # warehouse dir is a static conf — the session default
    # (spark-warehouse/ under cwd, gitignored) is fine for the test
    from enclaveid_data_pipeline_spark.sources.layout import (
        drop_table,
        save_bucketed,
    )

    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    drop_table(spark, "b_orders")
    drop_table(spark, "b_lineitem")
    save_bucketed(orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    save_bucketed(
        lineitem, "b_lineitem", "l_orderkey", 8, sort_col="l_orderkey"
    )
    # disable broadcast so the planner must choose sort-merge — the
    # scale-regime plan this test is about (at 100 TB neither side
    # broadcasts); bucketing then removes BOTH shuffles AND sorts
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert n > 0
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: zero shuffle
    assert "Bucketed: true" in plan

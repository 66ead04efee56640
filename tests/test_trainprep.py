"""Unit tests for operators.trainprep: chunk boundary cases, split
determinism and coverage, mixture-rate gating, contamination
broadcast plan shape."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.trainprep import (
    chunk_tokens,
    contaminated_docs,
    hash_bucket,
    mixture_sample,
    with_split,
)


def _toks_df(spark, rows):
    return spark.createDataFrame(
        [(i, r.split()) for i, r in enumerate(rows)], "id long, t array<string>"
    )


class TestChunkTokens:
    def test_short_doc_single_chunk(self, spark):
        df = _toks_df(spark, ["a b c"])
        out = chunk_tokens(df, F.col("t"), size=5, stride=3).collect()
        assert len(out) == 1
        assert out[0]["chunk_id"] == 0
        assert out[0]["chunk"] == ["a", "b", "c"]

    def test_exact_size_single_chunk(self, spark):
        df = _toks_df(spark, ["a b c d e"])
        out = chunk_tokens(df, F.col("t"), size=5, stride=3).collect()
        assert len(out) == 1

    def test_overlap_and_tail(self, spark):
        # 8 tokens, size 5, stride 3 -> chunks at 1..5 and 4..8: the
        # tail chunk is full here; 9 tokens would add a short third.
        df = _toks_df(spark, ["t0 t1 t2 t3 t4 t5 t6 t7"])
        out = sorted(
            chunk_tokens(df, F.col("t"), size=5, stride=3).collect(),
            key=lambda r: r["chunk_id"],
        )
        assert [r["chunk"] for r in out] == [
            ["t0", "t1", "t2", "t3", "t4"],
            ["t3", "t4", "t5", "t6", "t7"],
        ]

    def test_every_token_covered(self, spark):
        df = _toks_df(spark, ["w%d" % i for i in range(1)] * 0 + [" ".join(f"w{i}" for i in range(50))])
        out = chunk_tokens(df, F.col("t"), size=8, stride=5).collect()
        covered = {tok for r in out for tok in r["chunk"]}
        assert covered == {f"w{i}" for i in range(50)}

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        n_tok=st.integers(min_value=1, max_value=120),
        size=st.integers(min_value=1, max_value=40),
        stride=st.integers(min_value=1, max_value=40),
    )
    def test_chunking_properties(self, spark, n_tok, size, stride):
        """For any (doc length, size, stride): every token appears in
        some chunk, chunk ids are dense from 0, every chunk is
        size-bounded, and all chunks except the last are full when
        stride <= size (full coverage regime)."""
        df = _toks_df(spark, [" ".join(f"w{i}" for i in range(n_tok))])
        out = sorted(
            chunk_tokens(df, F.col("t"), size=size, stride=stride).collect(),
            key=lambda r: r["chunk_id"],
        )
        assert [r["chunk_id"] for r in out] == list(range(len(out)))
        assert all(1 <= len(r["chunk"]) <= size for r in out)
        expected = 1 + min(
            max(0, -(-(n_tok - size) // stride)), (n_tok - 1) // stride
        )
        assert len(out) == expected
        if stride <= size:
            covered = {tok for r in out for tok in r["chunk"]}
            assert covered == {f"w{i}" for i in range(n_tok)}
            assert all(len(r["chunk"]) == size for r in out[:-1])

    def test_invalid_params_raise(self, spark):
        df = _toks_df(spark, ["a b"])
        with pytest.raises(ValueError):
            chunk_tokens(df, F.col("t"), size=0, stride=3)
        with pytest.raises(ValueError):
            chunk_tokens(df, F.col("t"), size=3, stride=0)


class TestSplit:
    def test_deterministic_and_total(self, spark):
        df = spark.range(500).withColumnRenamed("id", "doc_id")
        a = with_split(df, F.col("doc_id")).groupBy("split").count().collect()
        b = with_split(df, F.col("doc_id")).groupBy("split").count().collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        counts = {r["split"]: r["count"] for r in a}
        assert set(counts) == {"train", "val", "test"}
        assert sum(counts.values()) == 500
        # 93.75% expected train share; loose band for n=500
        assert 0.85 < counts["train"] / 500 < 0.99

    def test_row_local_no_shuffle_before_filter(self, spark):
        df = spark.range(100).withColumnRenamed("id", "doc_id")
        plan = (
            with_split(df, F.col("doc_id"))
            .filter(F.col("split") == "val")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestMixtureSample:
    def test_rates_gate_per_source(self, spark):
        df = (
            spark.range(2000)
            .withColumnRenamed("id", "doc_id")
            .withColumn(
                "source", F.when(F.col("doc_id") % 2 == 0, "keep").otherwise("drop")
            )
        )
        kept = mixture_sample(
            df, F.col("doc_id"), "source", {"keep": 1.0, "drop": 0.0}
        )
        rows = kept.groupBy("source").count().collect()
        counts = {r["source"]: r["count"] for r in rows}
        assert counts == {"keep": 1000}

    def test_default_rate_applies(self, spark):
        df = (
            spark.range(2000)
            .withColumnRenamed("id", "doc_id")
            .withColumn("source", F.lit("other"))
        )
        n = mixture_sample(
            df, F.col("doc_id"), "source", {}, default_rate=0.25
        ).count()
        assert 0.15 < n / 2000 < 0.35

    def test_bucket_range(self, spark):
        row = (
            spark.range(1000)
            .select(hash_bucket(F.col("id"), 256).alias("b"))
            .agg(F.min("b"), F.max("b"))
            .collect()[0]
        )
        assert row[0] >= 0 and row[1] < 256


class TestContamination:
    def test_counts_and_broadcast(self, spark):
        sh = spark.createDataFrame(
            [(1, "a b c"), (1, "b c d"), (2, "x y z"), (2, "a b c")],
            "doc_id long, s string",
        )
        bench = spark.createDataFrame(
            [(99, "a b c"), (99, "q r s")], "doc_id long, s string"
        )
        out = contaminated_docs(sh, bench).collect()
        counts = {r["doc_id"]: r["n_shared"] for r in out}
        assert counts == {1: 1, 2: 1}
        plan = (
            contaminated_docs(sh, bench)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestPackSequences:
    """Concat-and-split packing: token conservation, stream order,
    full-but-last invariant, empty-doc drop."""

    def _input(self, spark):
        from pyspark.sql import functions as F  # noqa: F401

        rows = [
            (i, i % 3, [f"t{i}_{j}" for j in range(i % 9)]) for i in range(40)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, shard int, toks array<string>"
        )

    def test_conservation_and_invariants(self, spark):
        from pyspark.sql import functions as F

        from enclaveid_data_pipeline_spark.operators.trainprep import (
            pack_sequences,
        )

        df = self._input(spark)
        out = pack_sequences(
            df, "doc_id", F.col("toks"), seq_len=7, part_cols=("shard",)
        ).collect()
        in_rows = df.collect()
        # every input token appears exactly once, in stream order
        for shard in {r.shard for r in in_rows}:
            stream = [
                t
                for r in sorted(in_rows, key=lambda r: r.doc_id)
                if r.shard == shard
                for t in r.toks
            ]
            packed = [
                t
                for r in sorted(
                    (r for r in out if r.shard == shard),
                    key=lambda r: r.seq_id,
                )
                for t in r.seq_tokens
            ]
            assert packed == stream
        # all sequences full except possibly the last per shard
        last = {}
        for r in out:
            last[r.shard] = max(last.get(r.shard, -1), r.seq_id)
        for r in out:
            if r.seq_id != last[r.shard]:
                assert len(r.seq_tokens) == 7
        # doc_ids are ascending within each sequence (stream order)
        for r in out:
            assert list(r.seq_doc_ids) == sorted(r.seq_doc_ids)
            assert r.seq_n_docs == len(r.seq_doc_ids)

    def test_empty_docs_dropped_and_validation(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from enclaveid_data_pipeline_spark.operators.trainprep import (
            pack_sequences,
        )

        df = spark.createDataFrame(
            [(1, ["a", "b"]), (2, []), (3, ["c"])],
            "doc_id long, toks array<string>",
        )
        out = pack_sequences(df, "doc_id", F.col("toks"), seq_len=10).collect()
        assert len(out) == 1 and list(out[0].seq_doc_ids) == [1, 3]
        assert list(out[0].seq_tokens) == ["a", "b", "c"]
        with pytest.raises(ValueError, match="positive"):
            pack_sequences(df, "doc_id", F.col("toks"), seq_len=0)


def test_write_training_shards_manifest(spark, tmp_path):
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.operators.trainprep import (
        pack_sequences,
    )
    from enclaveid_data_pipeline_spark.sources.writers import (
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, i % 4, [f"t{i}_{j}" for j in range(1 + i % 11)]) for i in range(300)],
        "doc_id long, shard int, toks array<string>",
    )
    packed = pack_sequences(
        docs, "doc_id", F.col("toks"), seq_len=16, part_cols=("shard",)
    ).withColumn("n_tokens", F.size("seq_tokens").cast("long"))
    # repartition into one partition per shard so the row cap is the
    # binding constraint, not task granularity
    packed = packed.repartition("shard")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        packed, path, shard_col="shard", max_rows_per_file=7,
        count_col="n_tokens",
    )
    rows = manifest.collect()
    # every file respects the row cap
    assert rows and all(r.n_rows <= 7 for r in rows)
    # manifest totals reconcile exactly with the packed input
    want = packed.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok")
    ).collect()[0]
    assert sum(r.n_rows for r in rows) == want.n
    assert sum(r.total_n_tokens for r in rows) == want.tok
    # files live under their shard's partition directory
    for r in rows:
        assert f"shard={r.shard}" in r.file
    # the written layout reads back complete
    assert spark.read.parquet(path).count() == want.n


def test_with_global_ordinal_dense_and_shard_parallel(spark):
    from pyspark.sql import functions as F

    from enclaveid_data_pipeline_spark.operators.trainprep import (
        with_global_ordinal,
    )

    df = spark.createDataFrame(
        [(s, i) for s in (2, 0, 1) for i in range(10 * (s + 1))],
        "shard int, seq long",
    ).repartition(8)
    out = with_global_ordinal(df, "shard", "seq").collect()
    # dense 0..n-1, and ordered by (shard, seq)
    got = sorted((r.ordinal, r.shard, r.seq) for r in out)
    assert [g[0] for g in got] == list(range(60))
    assert got == sorted(
        (i, s, q)
        for i, (s, q) in enumerate(
            sorted((r.shard, r.seq) for r in out)
        )
    )


def test_remove_duplicated_spans_semantics(spark):
    """'the quick brown' is shared by docs 1 and 2 → its three token
    positions vanish from both; doc 3 shares nothing and survives
    intact; doc 4 is a verbatim copy of doc 5 → both fully removed."""
    from enclaveid_data_pipeline_spark.operators.trainprep import (
        remove_duplicated_spans,
    )

    rows = [
        (1, "the quick brown fox jumps high"),
        (2, "see the quick brown dog"),
        (3, "entirely unique words here"),
        (4, "copy pasta text"),
        (5, "copy pasta text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in remove_duplicated_spans(
            docs, id_col="doc_id", text_col="text", n=3, min_docs=2
        ).collect()
    }
    assert got[1] == (6, 3, "fox jumps high")
    assert got[2] == (5, 3, "see dog")
    assert got[3] == (4, 0, "entirely unique words here")
    assert got[4] == (3, 3, "")
    assert got[5] == (3, 3, "")


def test_remove_duplicated_spans_overlapping_grams(spark):
    """Two shared grams overlapping by two tokens cover the union of
    their positions, not double-remove."""
    from enclaveid_data_pipeline_spark.operators.trainprep import (
        remove_duplicated_spans,
    )

    rows = [
        (1, "a b c d x y"),
        (2, "a b c q r s"),
        (3, "p b c d e f"),
    ]
    # shared grams: 'a b c' (docs 1,2), 'b c d' (docs 1,3)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_removed"], r["clean_text"])
        for r in remove_duplicated_spans(
            docs, id_col="doc_id", text_col="text", n=3, min_docs=2
        ).collect()
    }
    assert got[1] == (4, "x y")      # positions 0..3 covered once
    assert got[2] == (3, "q r s")
    assert got[3] == (3, "p e f")


def test_dsir_weights_prefer_target_like_docs(spark):
    """Importance weights are a pure function of TEXT (the target
    flag only shapes the bucket LM), and target-like text must
    outscore off-target text."""
    import pyspark.sql.functions as F

    from enclaveid_data_pipeline_spark.operators.trainprep import (
        dsir_log_weights,
    )

    rows = (
        [(i, "alpha beta gamma", "en") for i in range(10)]
        + [(10 + i, "delta epsilon zeta", "fr") for i in range(10)]
        + [(20, "alpha beta gamma", "fr"), (21, "delta epsilon zeta", "en")]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    w = {
        r["doc_id"]: r["logw_micro"]
        for r in dsir_log_weights(
            docs, F.col("lang") == "en", F.split("text", " ")
        ).collect()
    }
    # same text => same weight, regardless of the doc's own label
    assert w[0] == w[20] and w[10] == w[21]
    # en-dominated text outscores fr-dominated text
    assert w[0] > w[10]

"""Streaming inverted-index sink + BM25 serving (round 12): search
results from the continuously maintained index must equal the
one-shot bm25_topk computation over the same corpus, and a full
no-checkpoint replay must change nothing."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from enclaveid_data_pipeline_spark.operators.retrieval import (
    bm25_from_index,
    bm25_topk,
)
from enclaveid_data_pipeline_spark.streaming.sinks import (
    inverted_index_sink,
)

_DOCS = [
    (i, f"shared common tokens doc{i} body{i} plus topic{i % 5} "
        f"filler{i} and words{i} tail{i % 3}")
    for i in range(24)
]


def _queries(spark):
    # three query docs' distinct terms, ids disjoint from the corpus
    rows = []
    for qid, text in (
        (900, "topic1 words7 shared"),
        (901, "doc3 body3 common"),
        (902, "tail2 filler11 tokens plus"),
    ):
        rows += [(qid, t) for t in set(text.split())]
    return spark.createDataFrame(rows, "query_id long, term string")


def _drop_docs(spark, tmp_path, stream_dir, name, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    staging = tmp_path / "staging" / name
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    part = next(staging.glob("part-*.parquet"))
    shutil.copy(part, stream_dir / f"docs-{name}.parquet")


def _run_stream(spark, tmp_path, out, batches):
    stream_dir = tmp_path / "in"
    stream_dir.mkdir(exist_ok=True)

    def start():
        return inverted_index_sink(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(stream_dir)),
            out,
        )

    q = start()
    try:
        for i, rows in enumerate(batches):
            _drop_docs(spark, tmp_path, stream_dir, f"{i:03d}", rows)
            q.processAllAvailable()
    finally:
        q.stop()
    return start


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_index_serves_one_shot_bm25(spark, tmp_path):
    out = str(tmp_path / "idx")
    start = _run_stream(
        spark, tmp_path, out, [_DOCS[:9], _DOCS[9:17], _DOCS[17:]]
    )
    queries = _queries(spark)
    doc_terms = spark.createDataFrame(
        _DOCS, "doc_id long, text string"
    ).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    want = _rows(bm25_topk(doc_terms, queries, k=5))
    got = _rows(bm25_from_index(spark, out, queries, k=5))
    assert got == want and len(want) == 15  # 3 queries x top-5

    # full no-checkpoint replay: postings partitions rewrite
    # themselves, both additive folds skip via their own guards
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert _rows(bm25_from_index(spark, out, queries, k=5)) == want

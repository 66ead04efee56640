"""Training-set preparation queries on the ``documents`` corpus:
deterministic splits, stride-overlap chunking, benchmark
contamination, and mixture sampling (operators.trainprep).

Every operator is md5-deterministic, so each oracle replays the
identical hash pipeline in DuckDB ('0x'||hex → BIGINT mirrors
Spark's ``conv(hex, 16, 10)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import tokenize, word_shingles
from ..operators.trainprep import (
    chunk_tokens,
    contaminated_docs,
    mixture_sample,
    with_split,
)
from ..sources.readers import read_table
from .registry import register

#: DuckDB twin of operators.trainprep.hash_bucket.
_DUCK_BUCKET = "('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT"

_DUCK_SHINGLES4 = (
    "list_transform(generate_series(1, greatest(len(t) - 3, 0)), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])"
)


@register(
    "train_val_test_split",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               {_DUCK_BUCKET} % 256 AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 240 THEN 'train'
                WHEN bucket < 248 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(len(t)), 4) AS avg_tokens,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM b
    GROUP BY 1
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 240/8/8-bucket (93.75/3.125/3.125%) train/val/
    test split, summarized per split. Membership is a pure function
    of md5(doc_id) — stable under retries, repartitioning, and
    incremental corpus growth, unlike ``rand()``-seeded splits. The
    assignment itself is a row-local expression: zero shuffle until
    this summary's 3-group aggregate."""
    docs = read_table(spark, sf_dir, "documents")
    split = with_split(docs, key=F.col("doc_id"))
    return (
        split.withColumn("n_tok", F.size(tokenize(F.col("text"))))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@register(
    "chunk_docs_32x24",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), ch AS (
        SELECT doc_id, t,
               unnest(generate_series(
                   0, (greatest(len(t) - 32, 0) + 23) // 24)) AS chunk_id
        FROM toks
    )
    SELECT doc_id, chunk_id,
           CAST(len(t[chunk_id*24 + 1 : chunk_id*24 + 32]) AS BIGINT)
               AS n_tokens,
           md5(array_to_string(t[chunk_id*24 + 1 : chunk_id*24 + 32], ' '))
               AS chunk_key
    FROM ch
    """,
)
def chunk_docs_32x24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-overlap chunking for tokenizer sharding: 32-token
    windows advancing 24 tokens (8-token overlap), one output row per
    chunk with its token count and content key. Generate-and-explode,
    row-local, no shuffle — output volume (~len/stride rows per doc)
    scales linearly and partition-locally with the corpus."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("t"))
    chunks = chunk_tokens(toks, F.col("t"), size=32, stride=24)
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size("chunk").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_key"),
    )


@register(
    "benchmark_contamination_4gram",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
        SELECT doc_id, unnest(list_distinct({_DUCK_SHINGLES4})) AS s
        FROM toks
    ), bench AS (
        SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0
    )
    SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM sh a JOIN bench b ON a.s = b.s
    WHERE a.doc_id % 50 <> 0
    GROUP BY a.doc_id
    """,
)
def benchmark_contamination_4gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scrub (the n-gram membership test used
    to keep eval data out of training corpora): every 50th document
    plays the benchmark suite; report, per remaining corpus doc, how
    many of its distinct 4-grams appear in the benchmark. The
    benchmark n-gram set broadcasts (real suites are ~10^5 n-grams vs
    a 100 TB corpus), so the corpus side is a map-side hash probe —
    the only shuffle is the final per-doc count."""
    docs = read_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokenize(F.col("text")), 4))
        ).alias("s"),
    )
    bench = sh.filter(F.col("doc_id") % 50 == 0)
    corpus = sh.filter(F.col("doc_id") % 50 != 0)
    return contaminated_docs(corpus, bench).withColumn(
        "n_shared", F.col("n_shared").cast("long")
    )


@register(
    "source_mixture_counts",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept
    FROM documents
    WHERE {_DUCK_BUCKET} % 65536 <
          CASE source WHEN 'src0' THEN 1.0
                      WHEN 'src1' THEN 0.5
                      WHEN 'src2' THEN 0.25
                      ELSE 0.1 END * 65536
    GROUP BY source
    """,
)
def source_mixture_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture reweighting: keep 100% of src0, 50% of src1, 25%
    of src2, 10% of everything else, via a deterministic hash gate
    per document (reproducible and repartition-stable, unlike
    ``sample()``); report surviving doc counts per source. The gate
    is a row-local filter evaluated at the scan — no shuffle until
    the count."""
    docs = read_table(spark, sf_dir, "documents")
    kept = mixture_sample(
        docs,
        key=F.col("doc_id"),
        source_col="source",
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_rate=0.1,
    )
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))

"""BM25 lexical retrieval over an inverted-index join.

The suite's hybrid search (queries/dedup_queries.py) uses TF-IDF
cosine as its lexical side; BM25 is the standard-issue lexical
scorer a search/training-data engine is expected to ship (Robertson &
Spärck Jones probabilistic relevance framework; the Lucene-default
``k1=1.2, b=0.75`` variant with the +1 idf floor). Beyond-reference
capability by design: the reference ranks only by embedding cosine
(reference ``assets/recent_history.py:253-320``); BM25 completes the
lexical half of the hybrid-retrieval family this suite already
carries (RRF fusion, TF-IDF cosine), expressed as DataFrame algebra.

Plan shape at scale — the same inverted-join discipline as the
TF-IDF path:

- the corpus term-frequency table shuffles ONCE on term (the
  inverted index; persist bucketed by term and the probe is
  co-located);
- the query-term table is workload-sized; it BROADCASTS (gated)
  into the posting join, so the corpus is filtered to query terms
  before any scoring work;
- N, Σdl ride in-plan as a broadcast 1-row frame (never separately
  collected scalars that could disagree with the scored rows);
- per-(query, doc) scores are SUMS OF INTEGERS: with k1 = 6/5 and
  b = 3/4 the tf-normalization is exactly ``p/q`` for integer
  ``p = 44·tf·S`` and ``q = 20·tf·S + 6·S + 18·dl·N`` (S = Σdl),
  and idf is pre-rounded to integer 1e-4 units from integer (df, N)
  inputs — so the only float ops are one deterministic ln per
  distinct term and one int/int double division per scored term,
  and the final per-document sum is BIGINT addition: engine- and
  partitioning-order-independent, hence DuckDB-oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: fixed-point scale for idf and scores (1e-4 units — the suite's
#: round(x, 4) derived-float convention)
BM25_SCALE = 10_000

#: the classic defaults, FIXED because their rationality (6/5, 3/4)
#: is what makes the score integer-exact; a parameterized variant
#: would reintroduce float normalization
BM25_K1_NUM, BM25_K1_DEN = 6, 5
BM25_B_NUM, BM25_B_DEN = 3, 4


def bm25_topk(
    doc_terms: DataFrame | None,
    query_terms: DataFrame,
    k: int = 5,
    doc_id: str = "doc_id",
    query_id: str = "query_id",
    term: str = "term",
    exclude_self: bool = False,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents per query under BM25 (k1=1.2, b=0.75).

    ``doc_terms``: one row per term OCCURRENCE (doc_id, term) — the
    forward table exploded. ``query_terms``: (query_id, term); term
    multiplicity within a query is ignored (distinct-term scoring,
    the common retrieval convention — stated, and mirrored by the
    oracle). Returns (query_id, neighbor_id, score, rank) with
    ``score`` in 1e-4-rounded units and rank ties broken on
    neighbor_id.

    idf uses the +1 floor form ``ln(1 + (N - df + ½)/(df + ½))`` —
    always positive, so stopword-heavy queries degrade gracefully
    instead of subtracting. ``exclude_self=True`` drops hits whose
    document id equals the query id (for query-by-document workloads
    where ids share a namespace — the hybrid-retrieval convention).

    ``tf`` (optional) supplies an already-materialized
    ``(doc_id, term, tf)`` inverted table in place of ``doc_terms``
    (which is then ignored and may be None) — for callers that share
    one index build across several retrieval queries
    (queries.text_queries._doc_tf_shared)."""
    from ..materialize import materialize as _materialize

    # ONE corpus pass: materialize the (doc, term, tf) inverted table
    # and derive lengths/totals/df from IT — dl, corpus and df_t each
    # have independent lineage otherwise, so the corpus explode ran
    # 4-5x per query (the in-plan analog of what inverted_index_sink
    # persists; at 100 TB this table IS the persisted bucketed index)
    if tf is not None:
        tf = tf.select(
            F.col(doc_id).alias("__d"),
            F.col(term).alias("__t"),
            F.col("tf").alias("__tf"),
        )
    else:
        tf = _materialize(
            doc_terms.groupBy(
                F.col(doc_id).alias("__d"), F.col(term).alias("__t")
            ).agg(F.count(F.lit(1)).alias("__tf")),
            "local",
        )
    dl = tf.groupBy("__d").agg(F.sum("__tf").alias("__dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("__N"),
        F.sum("__dl").alias("__S"),
    )
    df_t = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    return _bm25_score(
        tf,
        df_t,
        corpus,
        query_terms.select(
            F.col(query_id), F.col(term).alias("term")
        ),
        k,
        query_id=query_id,
        dl=dl,
        exclude_self=exclude_self,
    )


def _bm25_score(
    tf: DataFrame,
    df_t: DataFrame,
    corpus: DataFrame,
    query_terms: DataFrame,
    k: int,
    query_id: str = "query_id",
    dl: DataFrame | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Shared BM25 scoring core over index-shaped inputs — ``tf``
    (__d, __t, __tf[, __dl]), ``df_t`` (__t, __df), ``corpus``
    (1 row: __N, __S) — consumed by :func:`bm25_topk` (index derived
    in-plan; per-doc lengths arrive as the separate ``dl`` frame and
    join AFTER the query-term filter, so only query-relevant
    postings ever pay the doc-side join) and ``bm25_from_index``
    (lengths already denormalized into the persisted posting rows).
    One scoring path ⇒ streamed-index and one-shot results can only
    differ if the INDEX differs — exactly what the equivalence test
    pins."""
    from ..functions.joins import gated_broadcast
    from ..materialize import materialize as _materialize

    # the query-term table is workload-sized but its LINEAGE may be a
    # corpus scan (the fixed-query registry form derives queries from
    # the document table): materialize before the count, the
    # broadcast build, and the df cut each re-run that lineage
    # (3 corpus explodes for a <=50k-row table — measured 10.8s vs
    # ~3s for the sf0.1 headline entry)
    q = _materialize(
        query_terms.select(
            F.col(query_id).alias("__q"), F.col("term").alias("__t")
        ).distinct(),
        "local",
    )
    n_q = q.count()

    # posting lists filtered to query terms BEFORE scoring: the
    # workload-sized side broadcasts, the corpus-sized tf table
    # never moves except on its one term shuffle. The (vocab-sized)
    # df table is cut to query terms FIRST so what broadcasts into
    # the scoring join is bounded by the query vocabulary, never the
    # corpus vocabulary.
    qterms = q.select("__t").distinct()
    df_q = df_t.join(gated_broadcast(qterms, n_q), on="__t")
    scored = tf.join(gated_broadcast(q, n_q), on="__t")
    if exclude_self:
        scored = scored.filter(F.col("__q") != F.col("__d"))
    if dl is not None:
        scored = scored.join(dl, on="__d")
    scored = scored.join(gated_broadcast(df_q, n_q), on="__t").crossJoin(
        F.broadcast(corpus)
    )
    idf_fx = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("__N") - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
        )
        * F.lit(BM25_SCALE)
    ).cast("long")
    p = F.lit(44) * F.col("__tf") * F.col("__S")
    qq = (
        F.lit(20) * F.col("__tf") * F.col("__S")
        + F.lit(6) * F.col("__S")
        + F.lit(18) * F.col("__dl") * F.col("__N")
    )
    term_fx = F.round(
        idf_fx.cast("double") * p.cast("double") / qq.cast("double")
    ).cast("long")
    ranked = (
        scored.select("__q", "__d", term_fx.alias("__fx"))
        .groupBy("__q", "__d")
        .agg(F.sum("__fx").alias("__score_fx"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("__q").orderBy(
                    F.desc("__score_fx"), F.asc("__d")
                )
            ),
        )
        .filter(F.col("rank") <= k)
    )
    return ranked.select(
        F.col("__q").alias(query_id),
        F.col("__d").alias("neighbor_id"),
        F.round(F.col("__score_fx") / F.lit(float(BM25_SCALE)), 4).alias(
            "score"
        ),
        F.col("rank").cast("long").alias("rank"),
    )


def bm25_from_index(
    spark,
    path: str,
    query_terms: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
) -> DataFrame:
    """BM25 top-``k`` served from the PERSISTED inverted index a
    :func:`streaming.sinks.inverted_index_sink` maintains — the
    search-over-continuously-ingested-corpus shape. Reads
    ``<path>/postings`` (term, doc_id, tf, dl — lengths denormalized
    at write time so serving never joins a doc table), ``<path>/stats``
    (term, df) and ``<path>/corpus`` (n_docs, total_len), then runs
    the SAME scoring core as :func:`bm25_topk`. At scale the
    postings table is bucketed by term, so the query-term semi-join
    prunes to the probed buckets."""
    import os

    postings = spark.read.parquet(os.path.join(path, "postings")).select(
        F.col("doc_id").alias("__d"),
        F.col("term").alias("__t"),
        F.col("tf").alias("__tf"),
        F.col("dl").alias("__dl"),
    )
    stats = spark.read.parquet(os.path.join(path, "stats")).select(
        F.col("term").alias("__t"), F.col("df").alias("__df")
    )
    corpus = spark.read.parquet(os.path.join(path, "corpus")).select(
        F.col("n_docs").alias("__N"), F.col("total_len").alias("__S")
    )
    return _bm25_score(
        postings, stats, corpus, query_terms, k, query_id=query_id
    )

"""Training-set preparation operators: deterministic splits,
stride-overlap chunking, benchmark-contamination detection, and
mixture sampling.

The reference pipeline stops at "clean sessions + embeddings"
(/root/reference/enclaveid_data_pipeline/assets/recent_history.py);
an LLM-training corpus pipeline additionally needs the steps between
"deduplicated documents" and "tokenizer-ready shards". Everything
here is hash-deterministic (md5, same hex in Spark and DuckDB) so:

- assignments are reproducible run-to-run and engine-to-engine (no
  ``rand()``: a resumed or re-partitioned job must land every doc in
  the same split/sample),
- the DuckDB oracle can replay each operator exactly.

Scale notes: splits and sampling are stateless row-local expressions
(no shuffle at all); chunking is a generate-and-explode (row-local,
output ~len/stride rows per doc); contamination broadcasts the
benchmark n-gram set — benchmark suites are tiny (~10^5 n-grams)
next to a 100 TB corpus, so the probe side never shuffles.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..materialize import materialize as _materialize


def hash_bucket(key: Column, buckets: int = 256) -> Column:
    """Deterministic uniform bucket in [0, buckets) from the md5 of
    ``key`` (cast to string first). 7 hex chars = 28 bits, unbiased
    for bucket counts that divide 2^28 and negligibly biased
    otherwise."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 7), 16, 10)
        .cast("long")
        % buckets
    )


def with_split(
    df: DataFrame,
    key: Column,
    boundaries: Sequence[tuple[str, int]] = (("train", 240), ("val", 248)),
    last: str = "test",
    buckets: int = 256,
    out_col: str = "split",
) -> DataFrame:
    """Assign a deterministic train/val/test split from a hash of the
    document key. ``boundaries`` are (name, exclusive-upper-bucket)
    pairs in ascending order; rows at or above the final boundary get
    ``last``. Defaults: 240/256 train (93.75%), 8/256 val, 8/256 test.

    Hash-based (not ``rand()``-based) so membership is a pure function
    of the key: stable under retries, repartitioning, and incremental
    appends — new documents never reshuffle old ones across splits.
    """
    bucket = hash_bucket(key, buckets)
    expr = None
    for name, upper in boundaries:
        cond = bucket < upper
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr.otherwise(last))


def chunk_tokens(
    df: DataFrame,
    tokens: Column,
    size: int,
    stride: int,
    out_col: str = "chunk",
) -> DataFrame:
    """Split each row's token array into fixed-``size`` windows that
    advance by ``stride`` tokens (overlap = size - stride), the
    standard packing step before tokenizer sharding. Short documents
    (≤ size tokens) yield exactly one (possibly short) chunk; the
    last window of a long document may be short.

    Emits one row per chunk with ``{out_col}_id`` (0-based ordinal
    within the doc) and ``{out_col}`` (the token slice). Pure
    generate-and-explode: row-local, no shuffle, no UDF; output row
    count is ~tokens/stride per document, so input partition sizing
    controls output partition sizing.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    # Extra windows beyond the first: enough to cover the tail
    # (ceil((n-size)/stride)), but never past the last token — with
    # stride > size (gapped sampling) the coverage form would emit an
    # empty trailing window (hypothesis-found; pinned in tests).
    n = F.size(tokens).cast("long")
    cover = (F.greatest(n - size, F.lit(0).cast("long")) + (stride - 1)) / stride
    last_start = (n - 1) / stride
    n_extra = F.least(cover.cast("long"), last_start.cast("long"))
    ids = F.sequence(F.lit(0).cast("long"), n_extra)
    return (
        df.withColumn("_toks", tokens)
        .withColumn(f"{out_col}_id", F.explode(ids))
        .withColumn(
            out_col,
            F.slice(
                F.col("_toks"),
                (F.col(f"{out_col}_id") * stride + 1).cast("int"),
                size,
            ),
        )
        .drop("_toks")
    )


def contaminated_docs(
    corpus_shingles: DataFrame,
    benchmark_shingles: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "s",
) -> DataFrame:
    """Benchmark-contamination check (the n-gram membership test used
    to scrub eval sets out of training corpora): count, per corpus
    document, how many of its distinct n-grams appear anywhere in the
    benchmark set.

    Both inputs are (id, shingle) exploded frames; the benchmark side
    is deduplicated and broadcast — the corpus side streams through a
    map-side hash probe with no shuffle until the final per-doc count.
    """
    bench = F.broadcast(
        benchmark_shingles.select(shingle_col).distinct()
    )
    return (
        corpus_shingles.join(bench, shingle_col)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    seq_len: int,
    part_cols: Sequence[str] = (),
    out_prefix: str = "seq",
) -> DataFrame:
    """Concat-and-split sequence packing — the step that turns
    variable-length tokenized documents into the fixed-``seq_len``
    training sequences an LLM trainer consumes. Documents are laid
    end-to-end in deterministic ``id_col`` order within each
    ``part_cols`` shard; the concatenated token stream is cut every
    ``seq_len`` tokens, so documents may span a sequence boundary and
    sequences may hold many short documents (zero padding waste —
    only the final sequence of each shard can be short).

    Returns one row per packed sequence: ``{prefix}_id`` (0-based
    within the shard), ``{prefix}_tokens`` (exactly the tokens, in
    stream order), ``{prefix}_n_docs``, ``{prefix}_doc_ids`` (the
    contributing documents, in order — what a trainer needs for
    attention-mask resets at document boundaries).

    Shape: one window cumsum per shard for the global offset, a
    generate-and-explode for the (doc → sequences it touches) fan-out
    (a document of n tokens touches ≤ n/seq_len + 1 sequences), and
    one groupBy(shard, seq_id) to assemble. At corpus scale the
    window is the sequential part, so shard by something with
    thousands of groups (split × source × hash bucket); packing is
    embarrassingly parallel across shards and the only cross-shard
    cost is one possibly-short sequence per shard. Empty documents
    are dropped (they contribute no tokens).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    w = (
        Window.partitionBy(*part_cols).orderBy(id_col)
        if part_cols
        else Window.orderBy(id_col)
    )
    L = F.lit(seq_len).cast("long")
    p = out_prefix
    d = (
        df.withColumn("_toks", tokens)
        .withColumn("_n", F.size("_toks").cast("long"))
        .filter(F.col("_n") > 0)
        .withColumn(
            "_start",
            F.coalesce(
                F.sum("_n").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
    )
    seg = (
        d.withColumn(
            f"{p}_id",
            F.explode(
                F.sequence(
                    (F.col("_start") / L).cast("long"),
                    ((F.col("_start") + F.col("_n") - 1) / L).cast("long"),
                )
            ),
        )
        .withColumn(
            "_seg_start", F.greatest(F.col("_start"), F.col(f"{p}_id") * L)
        )
        .withColumn(
            "_seg_len",
            F.least(F.col("_start") + F.col("_n"), (F.col(f"{p}_id") + 1) * L)
            - F.col("_seg_start"),
        )
        .withColumn(
            "_seg",
            F.slice(
                F.col("_toks"),
                (F.col("_seg_start") - F.col("_start") + 1).cast("int"),
                F.col("_seg_len").cast("int"),
            ),
        )
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("_seg_start"), F.col("_seg"), F.col(id_col)))
    )
    return (
        seg.groupBy(*part_cols, f"{p}_id")
        .agg(
            F.flatten(F.transform(ordered, lambda x: x["_seg"])).alias(
                f"{p}_tokens"
            ),
            F.count(F.lit(1)).alias(f"{p}_n_docs"),
            F.transform(ordered, lambda x: x[id_col]).alias(f"{p}_doc_ids"),
        )
    )


def dsir_log_weights(
    docs: DataFrame,
    is_target: Column,
    tokens: Column,
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance log-weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"):
    estimate two add-one-smoothed unigram distributions over HASHED
    token buckets — the target slice vs the whole corpus — and score
    every document by sum_b c_b · (ln p_target(b) − ln p_raw(b)).
    Documents that look like the target get positive weights;
    resampling ∝ exp(weight) (see the Gumbel top-k at the query
    layer) tilts the corpus toward the target distribution without a
    trained classifier.

    Engine-portability and exactness: buckets come from
    :func:`hash_bucket` (md5 — replayable by the oracle), and the
    per-bucket log-ratio is quantized to integer micro-units BEFORE
    the per-doc sum, so the aggregation is exact BIGINT arithmetic —
    no float-summation order sensitivity between engines or
    partitionings.

    Scale shape: one token-stream pass for the two bucket counts
    (n_buckets reduce keys), one for the per-doc bucket counts; the
    n_buckets-row ratio table broadcasts. Everything else is
    row-local. Returns (id_col, logw_micro BIGINT).
    """
    tok = docs.select(
        F.col(id_col),
        is_target.cast("int").alias("__t"),
        F.explode(tokens).alias("__tok"),
    ).withColumn("__b", hash_bucket(F.col("__tok"), n_buckets))
    # materialized: the ≤n_buckets-row count table feeds BOTH the
    # totals aggregate and the ratio join — without the boundary each
    # consumer re-ran the corpus explode (r12 before-plan: 3 document
    # scans where the docstring promises 2 token passes)
    buckets = _materialize(
        tok.groupBy("__b").agg(
            F.sum("__t").alias("__nt"), F.count(F.lit(1)).alias("__nr")
        )
    )
    # rename before the totals agg: joining an aggregate back onto
    # its own parent leaves `__nt` resolvable to both lineages
    totals = buckets.select(
        F.col("__nt").alias("__tnt"), F.col("__nr").alias("__tnr")
    ).agg(F.sum("__tnt").alias("__Nt"), F.sum("__tnr").alias("__Nr"))
    ratio = buckets.alias("b").join(F.broadcast(totals.alias("t"))).select(
        F.col("b.__b").alias("__b"),
        F.round(
            (
                F.log(
                    (F.col("b.__nt") + 1) / (F.col("t.__Nt") + n_buckets)
                )
                - F.log(
                    (F.col("b.__nr") + 1) / (F.col("t.__Nr") + n_buckets)
                )
            )
            * 1_000_000
        )
        .cast("long")
        .alias("__ratio_micro"),
    )
    per_doc = tok.groupBy(id_col, "__b").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return (
        per_doc.join(F.broadcast(ratio), on="__b")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("__c") * F.col("__ratio_micro")).alias("logw_micro")
        )
    )


def mixture_sample(
    df: DataFrame,
    key: Column,
    source_col: str,
    rates: Mapping[str, float],
    default_rate: float = 1.0,
    buckets: int = 65536,
) -> DataFrame:
    """Per-source deterministic downsampling — the "data mixture"
    step that reweights corpus sources (keep 100% of wiki, 10% of
    crawl, ...). A row survives iff its hash bucket falls below
    ``rate * buckets`` for its source's rate.

    Hash-gated rather than ``sample()``: exact reproducibility,
    stable under repartitioning, and per-source rates in one pass
    (``DataFrame.sampleBy`` is seed-stable but not portable to the
    oracle). Row-local filter: no shuffle, fully pushdown-friendly.
    """
    rate_expr = None
    for src, rate in rates.items():
        cond = F.col(source_col) == src
        rate_expr = (
            F.when(cond, rate) if rate_expr is None else rate_expr.when(cond, rate)
        )
    rate_expr = (
        rate_expr.otherwise(default_rate)
        if rate_expr is not None
        else F.lit(default_rate)
    )
    return df.filter(hash_bucket(key, buckets) < rate_expr * buckets)


def with_global_ordinal(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    out_col: str = "ordinal",
) -> DataFrame:
    """Dense 0-based global ordinal over (shard, order) — the "row
    number across the whole corpus" a trainer needs for deterministic
    resume points and sample addressing — WITHOUT a global-order
    window (which plans as one task holding the total order).

    Two-pass shape: per-shard counts (one tiny aggregate), a window
    cumsum over the SHARD COUNT table only (|shards| rows — driver-
    free and trivially small), broadcast the per-shard offsets back,
    and add the within-shard row_number. The big side's window
    partitions by shard, so every task orders only its shard —
    parallelism = shard count, same contract as
    :func:`pack_sequences`.
    """
    from pyspark.sql import Window

    counts = df.groupBy(shard_col).agg(F.count(F.lit(1)).alias("__n"))
    offsets = counts.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy(shard_col).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0).cast("long"),
        ),
    ).select(shard_col, "__offset")
    w = Window.partitionBy(shard_col).orderBy(order_col)
    return (
        df.join(F.broadcast(offsets), on=shard_col)
        .withColumn(
            out_col,
            (F.row_number().over(w) - 1 + F.col("__offset")).cast("long"),
        )
        .drop("__offset")
    )


def balance_classes(
    df: DataFrame,
    label_col: str,
    target_per_class: int,
    key: Column,
) -> DataFrame:
    """Deterministic class rebalancing toward ``target_per_class``
    rows per label: minority classes oversample by integer
    replication plus a hash-gated extra copy for the fractional
    remainder; majority classes downsample through the same gate
    (ratio < 1 → zero whole copies, keep-probability = ratio). In
    expectation every class lands on the target, and membership is a
    pure function of ``key`` — the with_split stance — so the
    resample survives retries, repartitioning, and corpus growth,
    and replays in SQL.

    Plan: per-class counts are a tiny aggregate broadcast back; the
    copy decision and ``explode(sequence(...))`` fan-out are
    row-local. Nothing shuffles but the |labels|-row count table.
    Output carries ``copy_idx`` (0-based) so downstream dedup-aware
    ops can distinguish replicas.
    """
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__cnt"))
    # uniform u ∈ [0, 1) from 28 bits of md5(key) — replayable
    u = F.conv(F.substring(F.md5(key.cast("string")), 1, 7), 16, 10).cast(
        "double"
    ) / F.lit(268435456.0)
    ratio = F.lit(float(target_per_class)) / F.col("__cnt")
    n_whole = F.floor(ratio).cast("int")
    frac = ratio - n_whole
    n_copies = n_whole + F.when(u < frac, 1).otherwise(0)
    return (
        df.join(F.broadcast(counts), on=label_col)
        .withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(0), F.col("__n") - 1)),
        )
        .drop("__cnt", "__n")
    )


def remove_duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Exact duplicated-span REMOVAL (the RefinedWeb / "Deduplicating
    Training Data" exact-substring pass, word-granular): any n-gram
    occurring in ≥ ``min_docs`` distinct documents marks its n token
    positions as duplicated in every document containing it; the
    cleaned text is the surviving tokens in original order. Where
    ``duplicated_ngram_fraction`` only *measures* boilerplate, this
    rewrites the corpus without it.

    Returns ``(id, n_tokens, n_removed, clean_text)`` for every input
    document (fully-removed docs yield ``clean_text = ''``).

    Shape: gram generation is row-local (posexplode of the shingle
    array); the only corpus-wide state is the shared-gram table
    (grams with document frequency ≥ min_docs — Zipf-small next to
    the token stream) consumed via a semi-join; coverage expansion is
    a row-local sequence explode; reassembly is one per-doc aggregate
    sorting (pos, token) structs. Every shuffle keys on uniform gram
    strings or the doc id — no skew amplification.
    """
    from .dedup import tokenize, word_shingles

    # NOT materialized, deliberately (r12 interleaved A/B): the
    # tokenized corpus feeds four consumers, but recomputing it is one
    # vectorized parquet scan + split() per consumer, while pinning it
    # stores fat token arrays in block storage and re-deserializes
    # them per consumer — measured 0.46s vs 0.52s at sf0.1 and 0.35s
    # vs 1.06s at sf1 in favor of recompute (guide §5: cache only when
    # recompute costs more than the memory pressure).
    toks = docs.select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("t")
    )
    # pos is 0-based; gram at pos covers token positions pos..pos+n-1
    grams = toks.select(
        "id", F.posexplode(word_shingles(F.col("t"), n)).alias("pos", "gram")
    )
    shared = (
        grams.groupBy("gram")
        .agg(F.count_distinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    covered = (
        grams.join(shared, on="gram", how="leftsemi")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("p"),
        )
        .distinct()
    )
    tokpos = toks.select(
        "id", F.posexplode(F.col("t")).alias("p", "tok")
    )
    kept = tokpos.join(covered, on=["id", "p"], how="left_anti")
    cleaned = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("p"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        toks.select("id", F.size("t").cast("long").alias("n_tokens"))
        .join(cleaned, on="id", how="left")
        .select(
            "id",
            "n_tokens",
            (
                F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )

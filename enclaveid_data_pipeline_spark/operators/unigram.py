"""Distributed unigram-LM subword tokenizer (SentencePiece-style).

The other major subword algorithm beside BPE (operators/bpe.py): seed
a substring vocabulary, score pieces by a unigram language model, and
segment words with Viterbi; EM alternates Viterbi E-steps (piece
usage counts) with M-step re-scoring. Reference pipelines run
SentencePiece single-node over a corpus SAMPLE; this implementation
trains on the FULL corpus distributively by the classic reduction:
all statistics are over DISTINCT words weighted by corpus frequency,
so per-round cost is one pass over the (small) distinct-word table
however big the corpus is — the same distinct-word trick the BPE
trainer uses (bpe.py).

Engine-exactness: piece scores are INTEGER micro-bit costs,
``cost(p) = round(log2(total/count(p)) * 1024)`` (BIGINT). Viterbi
then minimizes an integer sum with the deterministic tie order
(cost, n_pieces, prev_position) — no float comparison anywhere in
the DP, so Spark, plain Python, and the DuckDB unrolled-DP oracle
(queries/text_queries) agree bit-for-bit. log2 itself is evaluated
once per piece on both engines' identical doubles (same libm), the
same cross-engine contract the cosine/round(,6) oracles rely on.

Scale shape per stage:

- seed counts: distinct-word explode of substrings (≤ max_len per
  position) → groupBy(piece).sum(freq·occurrences) — shuffle carries
  piece partials, never corpus rows;
- Viterbi E-step: broadcast the (≤ vocab_target) cost table into a
  mapInPandas over distinct words — embarrassingly parallel, O(len ·
  max_len) ints per word;
- M-step: explode used pieces → one aggregation;
- encode: join corpus tokens to the distinct-word segmentation (the
  segmentation table is per-word, so the corpus pass is one hash
  join on the word string).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: fixed-point scale for integer micro-bit costs
COST_SCALE = 1024


def piece_cost(count: int, total: int) -> int:
    """Integer micro-bit cost of a piece: round(log2(total/count)·1024)."""
    return round(math.log2(total / count) * COST_SCALE)


def distinct_words(df: DataFrame, token_col: str) -> DataFrame:
    """(word, freq) over a token column — the weighted support every
    training stage runs on."""
    return df.groupBy(F.col(token_col).alias("word")).agg(
        F.count(F.lit(1)).alias("freq")
    )


def seed_piece_counts(
    words: DataFrame, max_piece_len: int = 4, min_count: int = 2
) -> DataFrame:
    """Seed vocabulary counts: every substring of length ≤
    ``max_piece_len`` of every distinct word, weighted by word
    frequency (one count per occurrence position per corpus
    occurrence). Pieces under ``min_count`` are dropped EXCEPT
    single characters, which always stay so Viterbi can never dead-
    end. Returns (piece, cnt)."""
    sub = words.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_piece_len),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda ln: F.col("word").substr(i, ln),
                    ),
                )
            )
        ).alias("piece"),
    )
    counts = sub.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    return counts.filter(
        (F.col("cnt") >= min_count) | (F.length("piece") == 1)
    )


def costs_from_counts(counts: DataFrame) -> DataFrame:
    """(piece, cost) — integer micro-bit costs over the kept-piece
    total. Written as ``ln(total/cnt) / ln(2) * 1024`` so the DuckDB
    oracle can mirror the EXACT operation sequence (both engines call
    libm ``log`` then divide by the same ln-2 literal); rounding to
    the integer scale is the cross-engine contract — after it the
    whole DP is integer-exact."""
    total = counts.agg(F.sum("cnt")).collect()[0][0]
    return counts.select(
        "piece",
        F.round(
            F.log(F.lit(float(total)) / F.col("cnt"))
            / F.lit(math.log(2.0))
            * COST_SCALE
        )
        .cast("long")
        .alias("cost"),
    )


def viterbi_segment_word(
    word: str, costs: dict[str, int], max_piece_len: int = 4
) -> tuple[int, list[str]]:
    """Exact-integer Viterbi: minimize (Σcost, n_pieces, then prefer
    the longer final piece at every boundary — i.e. smaller previous
    position). Returns (total_cost, pieces). Raises KeyError only if
    some single character is absent from ``costs`` (seed guarantees
    it never is)."""
    n = len(word)
    # best[i] = (cost, k, prev_pos, piece_len) for prefix word[:i]
    best: list[tuple[int, int, int, int] | None] = [None] * (n + 1)
    best[0] = (0, 0, -1, 0)
    for i in range(1, n + 1):
        cand = None
        for j in range(1, min(max_piece_len, i) + 1):
            prev = best[i - j]
            if prev is None:
                continue
            piece = word[i - j : i]
            c = costs.get(piece)
            if c is None:
                if j == 1:
                    raise KeyError(f"character {piece!r} not in vocab")
                continue
            key = (prev[0] + c, prev[1] + 1, i - j)
            if cand is None or key < cand[:3]:
                cand = (*key, j)
        best[i] = cand
    assert best[n] is not None
    pieces: list[str] = []
    i = n
    while i > 0:
        _, _, prev_pos, j = best[i]
        pieces.append(word[i - j : i])
        i = prev_pos if prev_pos >= 0 else 0
        if j == 0:
            break
    pieces.reverse()
    return best[n][0], pieces


_SEG_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType()),
        T.StructField("freq", T.LongType()),
        T.StructField("cost", T.LongType()),
        T.StructField("pieces", T.ArrayType(T.StringType())),
    ]
)


def viterbi_segment(
    words: DataFrame, costs: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """Segment every distinct word under the broadcast cost table:
    (word, freq, cost, pieces). The cost table is vocab-sized (KBs-
    MBs) — collected once and shipped inside the pandas operator, the
    same broadcast-small-model shape as the IVF centroid argmin."""
    cost_map = {r["piece"]: r["cost"] for r in costs.collect()}

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_cost, out_pieces = [], []
            for w in pdf["word"]:
                c, p = viterbi_segment_word(w, cost_map, max_piece_len)
                out_cost.append(c)
                out_pieces.append(p)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "freq": pdf["freq"],
                    "cost": out_cost,
                    "pieces": out_pieces,
                }
            )

    return words.select("word", "freq").mapInPandas(op, schema=_SEG_SCHEMA)


def em_piece_counts(segmented: DataFrame) -> DataFrame:
    """M-step statistics: Viterbi piece usage weighted by word
    frequency → (piece, cnt). Single characters are re-guaranteed by
    unioning each word's character multiset at weight 0? No — they
    survive naturally when used; callers re-union missing singles
    via :func:`ensure_single_chars` before re-scoring."""
    return (
        segmented.select("freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )


def ensure_single_chars(counts: DataFrame, words: DataFrame) -> DataFrame:
    """Union every character of every word into the count table at
    count 1 if Viterbi stopped using it — keeps the vocab closed so
    the next E-step can never dead-end."""
    chars = (
        words.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.col("word").substr(i, F.lit(1)),
                )
            ).alias("piece")
        )
        .distinct()
        .withColumn("cnt", F.lit(1).cast("long"))
    )
    missing = chars.join(counts.select("piece"), on="piece", how="left_anti")
    return counts.unionByName(missing)


def prune_vocab(
    counts: DataFrame, vocab_target: int
) -> DataFrame:
    """Keep the ``vocab_target`` highest-count pieces (ties by piece
    string for determinism) plus ALL single characters — the
    SentencePiece pruning schedule's final state, without the
    per-piece likelihood-loss ranking (count rank is the standard
    cheap surrogate)."""
    from pyspark.sql import Window

    singles = counts.filter(F.length("piece") == 1)
    multi = counts.filter(F.length("piece") > 1)
    w = Window.orderBy(F.desc("cnt"), F.asc("piece"))
    kept = (
        multi.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= vocab_target)
        .drop("__rk")
    )
    return kept.unionByName(singles.join(kept, on="piece", how="left_anti"))


def train_unigram(
    df: DataFrame,
    token_col: str,
    rounds: int = 2,
    max_piece_len: int = 4,
    min_count: int = 2,
    vocab_target: int = 512,
) -> DataFrame:
    """Full training loop: seed → (segment → count → re-score) ×
    rounds → prune. Returns the final (piece, cost) table — the
    artifact :func:`encode_tokens` (and ``save_ann_index``-style
    persistence via the snapshot layer) consumes.

    Per-round cost: one distinct-word pass + one vocab-sized
    aggregation; plan depth stays constant because each round's cost
    table is COLLECTED (it is the model, vocab-sized by
    construction), so no lineage accumulates across rounds."""
    from ..materialize import materialize as _materialize

    # one boundary: every stage below re-reads the (small) distinct-
    # word table instead of re-running the corpus explode per action
    words = _materialize(distinct_words(df, token_col))
    counts = seed_piece_counts(words, max_piece_len, min_count)
    costs = costs_from_counts(counts)
    for _ in range(rounds):
        seg = viterbi_segment(words, costs, max_piece_len)
        counts = ensure_single_chars(em_piece_counts(seg), words)
        costs = costs_from_counts(counts)
    pruned = prune_vocab(counts, vocab_target)
    return costs_from_counts(pruned)


def encode_tokens(
    df: DataFrame,
    token_col: str,
    costs: DataFrame,
    max_piece_len: int = 4,
) -> DataFrame:
    """Encode a corpus under a trained cost table: input columns +
    ``pieces`` (array) + ``n_pieces`` + ``enc_cost``. One Viterbi
    pass over DISTINCT words, then a hash join back on the word
    string — the corpus never enters the DP."""
    words = distinct_words(df, token_col)
    seg = viterbi_segment(words, costs, max_piece_len).select(
        F.col("word").alias(token_col),
        "pieces",
        F.size("pieces").cast("long").alias("n_pieces"),
        F.col("cost").alias("enc_cost"),
    )
    # the segmentation table is distinct-word-sized; without the hint
    # Spark can't estimate mapInPandas output and plans a shuffle join
    return df.join(F.broadcast(seg), on=token_col, how="left")

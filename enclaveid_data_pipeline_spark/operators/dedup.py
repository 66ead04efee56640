"""Deduplication operators for training-data pipelines.

Beyond the reference's embedding-cosine near-dup merge
(assets/recent_history.py:384-447 — covered by operators.similarity +
operators.merge), a 100 TB corpus pipeline needs text-level dedup:

- exact (content-hash groupBy),
- MinHash + LSH banding (shingle → k min-hashes → band buckets →
  bucket equi-join; Broder 1997, Leskovec/Rajaraman/Ullman ch.3),
- SimHash (Charikar 2002; bitwise majority over token hashes),
- n-gram Jaccard verification on candidate pairs.

Engine-portability: every hash is ``md5`` (identical hex output in
Spark and DuckDB, so the oracle can replay the exact pipeline);
min-hash "permutations" are seeded by prefixing the shingle with the
seed index, and minima are taken lexicographically on the hex
strings (= minima over the 128-bit values).

Scale notes: everything here is groupBy/join on hash keys — no UDFs,
no driver loops. The LSH bucket join replaces the quadratic all-pairs
self-join: candidate generation cost is O(sum of bucket-size²), and
band keys are uniformly distributed by construction, so the shuffle
is skew-resistant without salting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize(text: Column) -> Column:
    """Whitespace tokenization (documents corpus is single-spaced)."""
    return F.split(text, " ")


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Overlapping word n-grams, 1-based element_at for engine parity
    with the oracle's 1-based list indexing. Empty when fewer than
    ``n`` tokens (guarded: Spark's ``sequence(1, 0)`` counts DOWN
    rather than returning an empty array)."""
    count = F.size(tokens) - (n - 1)
    sh = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(n)]
        ),
    )
    return F.when(count >= 1, sh).otherwise(
        F.array().cast("array<string>")
    )


def exact_dedup_groups(
    df: DataFrame,
    key: Column,
    id_col: str = "doc_id",
    min_group_size: int = 2,
) -> DataFrame:
    """Exact dedup: group by a content key, keep the min-id
    representative and the duplicate count. ``key`` is typically
    ``md5(text)`` or a normalized form of it."""
    return (
        df.select(key.alias("content_key"), F.col(id_col))
        .groupBy("content_key")
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_group_size)
    )


def minhash_columns(shingles: Column, num_hashes: int) -> list[Column]:
    """k min-hash values: ``min over shingles of md5(seed || '|' || s)``.

    The per-seed prefix plays the role of an independent permutation;
    lexicographic min over hex == numeric min over the 128-bit hash.
    NULL when the shingle set is empty.
    """
    return [
        F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{i}|"), s)))
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]


def with_lsh_bands(
    df: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """Fold ``mh*`` columns into ``bands`` band-key columns
    (``band{b} = md5(concat of the band's row hashes)``)."""
    out = df
    for b in range(bands):
        cols = [
            F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)
        ]
        out = out.withColumn(f"band{b}", F.md5(F.concat(*cols)))
    return out


def lsh_candidate_pairs(
    banded: DataFrame, id_col: str, bands: int
) -> DataFrame:
    """Distinct id pairs (left < right) sharing at least one band
    bucket. One narrow shuffle per band on a uniform hash key —
    the scale-path replacement for the all-pairs theta join."""
    pair_dfs = []
    for b in range(bands):
        keyed = banded.select(
            F.col(f"band{b}").alias("bk"), F.col(id_col).alias("id")
        ).filter(F.col("bk").isNotNull())
        a = keyed.select(F.col("bk"), F.col("id").alias("left_id"))
        bb = keyed.select(F.col("bk"), F.col("id").alias("right_id"))
        pair_dfs.append(
            a.join(bb, on="bk")
            .filter(F.col("left_id") < F.col("right_id"))
            .select("left_id", "right_id")
        )
    out = pair_dfs[0]
    for p in pair_dfs[1:]:
        out = out.union(p)
    return out.distinct()


def simhash16(tokens: Column) -> Column:
    """16-bit SimHash over the token multiset.

    Bit ``j`` uses the high bit of hex digit ``j`` of ``md5(token)``
    (a character test — identical in any engine with md5): tokens
    vote ±1 per bit, majority sets the bit. Returns a BIGINT in
    [0, 65535].
    """
    high = lambda j: F.size(  # noqa: E731
        F.filter(
            tokens,
            lambda t: F.substring(F.md5(t), j + 1, 1).isin(
                "8", "9", "a", "b", "c", "d", "e", "f"
            ),
        )
    )
    total = F.size(tokens)
    bit = lambda j: (high(j) * 2 > total).cast("long")  # noqa: E731
    out = F.lit(0).cast("long")
    for j in range(16):
        out = out + bit(j) * F.lit(1 << j)
    return out


def jaccard_similarity_pairs(
    df: DataFrame,
    id_col: str,
    shingles: Column,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard over all intersecting pairs.

    Explode distinct shingles → self-equi-join on shingle →
    intersection counts → ``J = i / (|A| + |B| - i)``. Only pairs
    sharing ≥1 shingle ever materialize, so cost tracks real overlap,
    not the quadratic pair space. Feed LSH candidates in as a
    semi-join to bound it further at scale.
    """
    sh = (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(shingles)).alias("s"))
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("s"), F.col("id").alias("left_id"))
    b = sh.select(F.col("s"), F.col("id").alias("right_id"))
    inter = (
        a.join(b, on="s")
        .filter(F.col("left_id") < F.col("right_id"))
        .groupBy("left_id", "right_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("id").alias("left_id"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("right_id"), F.col("n").alias("nb"))
    return (
        inter.join(sa, on="left_id")
        .join(sb, on="right_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("i").cast("double")
                / (F.col("na") + F.col("nb") - F.col("i")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )

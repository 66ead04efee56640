"""Count-min sketch: sublinear frequency estimation for heavy-hitter
queries over unbounded token domains.

At 100 TB the exact token-frequency table is itself huge (and the
interesting question — "which items are hot, roughly how hot" —
doesn't need it). A count-min sketch (Cormode & Muthukrishnan 2005)
compresses the whole stream into a depth×width counter grid:

- build: each occurrence increments one counter per hash row — as
  DataFrame algebra, explode the d row-hashes per item and run ONE
  (row, bucket) groupBy; the result is ≤ d·w rows no matter how big
  the input (d·w = 4·1024 here), trivially broadcastable;
- estimate: est(x) = min over rows of counter[row, h_row(x)] —
  never an underestimate, overestimates by collision mass bounded by
  e·N/w with probability 1−(1/2)^d.

Everything is md5-keyed (same determinism discipline as
operators.trainprep.hash_bucket): the sketch is a pure function of
the input multiset, identical across engines, partitionings and
retries — so the DuckDB oracle can rebuild the exact same grid and
the estimates match bit for bit. Merging shards/windows is counter
addition (one more groupBy), which is what makes the sketch the
streaming/incremental counterpart of the exact count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash rows (depth) and buckets per row (width)
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _bucket(item: Column, row: Column) -> Column:
    """Row-keyed bucket: first 8 md5 hex chars (32 bits) of
    ``row ':' item`` mod width — unbiased for powers of two, and
    byte-identical in any engine with md5."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(row.cast("string"), F.lit(":"), item)),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH
    )


def count_min_table(
    items: DataFrame, item_col: str = "item"
) -> DataFrame:
    """Build the sketch: ``(row, bucket, n)`` with ≤ depth·width
    rows. One row-local explode (d structs per occurrence) and one
    aggregation — the only shuffle, keyed on (row, bucket) which is
    uniform by construction (no skew regardless of item skew: a hot
    item's mass concentrates in d counters but arrives pre-combined
    by the map-side partial agg)."""
    hashes = F.transform(
        F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1)),
        lambda i: F.struct(
            i.alias("row"), _bucket(F.col(item_col), i).alias("bucket")
        ),
    )
    return (
        items.select(F.explode(hashes).alias("h"))
        .groupBy(F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def count_min_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    item_col: str = "item",
) -> DataFrame:
    """Point-query the sketch for each probe item: adds
    ``cms_est = min over rows of counter[row, bucket]`` (0 when every
    row's bucket is empty — only possible for items absent from the
    build input). The sketch side is broadcast: ≤ d·w rows by
    construction."""
    keyed = probes.select(
        "*",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1)),
                lambda i: F.struct(
                    i.alias("row"),
                    _bucket(F.col(item_col), i).alias("bucket"),
                ),
            )
        ).alias("h"),
    ).select("*", F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
    joined = keyed.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
    probe_cols = [c for c in probes.columns]
    return joined.groupBy(*probe_cols).agg(
        F.min(F.coalesce(F.col("n"), F.lit(0).cast("long"))).alias("cms_est")
    )

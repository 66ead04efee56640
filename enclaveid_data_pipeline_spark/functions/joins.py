"""Join-strategy helpers shared by operators.

``gated_broadcast`` is the round-12 fix for the one scale flaw the
round-11 sweep found: the tokenizer ENCODE paths (operators/unigram.py,
operators/bpe.py) unconditionally hinted ``F.broadcast`` on their
distinct-word segmentation/merge tables. Unlike centroids, codebooks,
or a trained cost table — which are workload-sized by construction —
the distinct-word table GROWS with the corpus (a 100 TB web corpus has
10⁸–10⁹ distinct "words" once typos/URLs/code identifiers are in
play), so the forced hint OOMs every executor exactly when the engine
is supposed to shine. The scale-safe plan above the bound is the plain
shuffle hash join on the word string (no skew concern beyond
stopwords, which the callers' ``length > 0`` filters already bound);
the hint only exists because Spark cannot estimate mapInPandas output
cardinality and would otherwise shuffle even tiny dictionaries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rows under which a dimension-like table is broadcast-joined.
#: ~10M rows of (word string + small payload) is roughly 1 GB
#: serialized — the conventional ceiling for an executor-resident
#: hash relation; above it the shuffle hash join wins at any scale.
DEFAULT_BROADCAST_MAX_ROWS = 10_000_000

#: env override so a cluster profile can tighten/loosen the bound
#: without touching call sites (smaller executors → smaller bound).
BROADCAST_MAX_ROWS_ENV = "SPARK_GRAFT_BROADCAST_MAX_ROWS"


def resolve_broadcast_bound(max_rows: int | None = None) -> int:
    """Explicit argument > env var > default."""
    if max_rows is not None:
        return int(max_rows)
    env = os.environ.get(BROADCAST_MAX_ROWS_ENV)
    return int(env) if env else DEFAULT_BROADCAST_MAX_ROWS


def gated_broadcast(
    df: DataFrame, n_rows: int, max_rows: int | None = None
) -> DataFrame:
    """Return ``F.broadcast(df)`` iff the caller-measured row count is
    within the bound, else ``df`` unhinted (Catalyst plans the shuffle
    hash join, the correct strategy for a big build side).

    ``n_rows`` is deliberately an argument, not a ``df.count()`` here:
    every call site already materializes the candidate table (or has
    its count from a prior action), so the gate costs nothing extra —
    and an implicit count on an unmaterialized frame would silently
    re-run the producing subtree."""
    if n_rows <= resolve_broadcast_bound(max_rows):
        return F.broadcast(df)
    return df

"""Incremental maintenance of mergeable aggregates.

A 100 TB pipeline cannot re-scan the corpus to refresh a summary
table every time a batch lands. The standard fix is the partial-
aggregate contract Spark already uses INSIDE a single job (map-side
partial agg → final merge), lifted to the table level: keep the
rollup in its mergeable form (sums, counts, mins, maxes — never
averages), fold each new batch's partials into it, and derive ratio
metrics at read time. The merge touches O(|existing keys| + |batch|)
rows — corpus size never appears in the cost.

The reference refreshes per-user materializations wholesale on its
poll sensor (reference sensors/__init__.py:16-40, the
re-materialization path); this module is the engine-level form that
makes that refresh O(batch).

Algebra: sum/count/min/max are commutative-monoid aggregates, so
``agg(A ∪ B) == merge(agg(A), agg(B))`` exactly — the equivalence the
oracle query and the property test pin. count merges by SUM (a count
of counts is wrong); avg must be stored as (sum, count).

COUNT(DISTINCT) is NOT mergeable — distinct counts from two batches
can't be added. The scalable incremental form is the ``hll`` kind: a
Datasketches HLL sketch per key (``hll_sketch_agg``), merged by
``hll_union_agg`` (sketch union is the set-union monoid; the union
gadget works in HLL_8, so the merged sketch is not byte-identical to
the single-pass sketch but estimates the same union — measured
within a fraction of a percent), estimated
at read time via :func:`with_estimate`. A sketch is KBs per key
regardless of corpus size; the exact-distinct alternative would force
the rollup to carry every distinct value ever seen.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure spec: name -> (kind, source column); kind in _KINDS.
#: source column is ignored for "count" (row count).
AggSpec = tuple[str, str]

_KINDS = ("sum", "count", "min", "max", "hll", "kll")


def _kll_merge(name: str):
    """Fold a key's KLL sketch partials into one via the TRUE
    aggregate merge (``kll_merge_agg_double`` — SQL-only in this
    Spark, hence the expr): partial-aggregable like ``hll_union_agg``,
    so a fold over many partials map-side combines instead of
    collecting a list. Merged estimates are rank-accurate, not
    byte-identical to a single-pass sketch — the same contract as
    the hll kind."""
    return F.expr(f"kll_merge_agg_double(`{name}`)")


#: how a partial of each kind folds with another partial of the same
#: kind — counts fold by SUM, distinct-count sketches by sketch union,
#: quantile sketches by pairwise Datasketches merge.
_MERGE_FN = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
    "hll": F.hll_union_agg,
    "kll": _kll_merge,
}


def _check(measures: Mapping[str, AggSpec]) -> None:
    for name, (kind, _src) in measures.items():
        if kind not in _KINDS:
            raise ValueError(
                f"measure {name!r}: kind {kind!r} is not mergeable; "
                f"store avg as (sum, count), distinct counts as 'hll', "
                f"and derive at read time"
            )


def rollup_partials(
    df: DataFrame,
    keys: tuple[str, ...],
    measures: Mapping[str, AggSpec],
) -> DataFrame:
    """Aggregate ONE batch to its partial rows — the unit that gets
    appended/merged into the persisted rollup. Fully map-side
    partial-aggregable; shuffle carries one row per (partition, key).
    """
    _check(measures)
    aggs = []
    for name, (kind, src) in measures.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(name))
        elif kind == "hll":
            aggs.append(F.hll_sketch_agg(src).alias(name))
        elif kind == "kll":
            aggs.append(
                F.kll_sketch_agg_double(F.col(src).cast("double")).alias(name)
            )
        else:
            aggs.append(getattr(F, kind)(src).alias(name))
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(
    existing: DataFrame,
    partials: DataFrame,
    keys: tuple[str, ...],
    measures: Mapping[str, AggSpec],
) -> DataFrame:
    """Fold a batch's partials into the persisted rollup:
    ``union → groupBy(keys) → kind-wise merge``. Cost is
    O(|existing| + |partials|) — never the corpus. New keys appear,
    existing keys update; at scale both sides are bucketed by
    ``keys`` so the merge is a co-located shuffle-free aggregation.
    """
    _check(measures)
    merged = existing.unionByName(partials)
    aggs = [
        _MERGE_FN[kind](name).alias(name)
        for name, (kind, _src) in measures.items()
    ]
    return merged.groupBy(*keys).agg(*aggs)


def with_ratio(
    rollup: DataFrame, out_col: str, num: str, den: str, digits: int = 6
) -> DataFrame:
    """Derive a read-time ratio (e.g. avg = sum/count) from mergeable
    parts — the reason averages are never stored."""
    return rollup.withColumn(
        out_col,
        F.round(F.col(num).cast("double") / F.col(den), digits),
    )


def with_estimate(rollup: DataFrame, out_col: str, sketch: str) -> DataFrame:
    """Derive the distinct-count estimate from a stored ``hll``
    sketch column — the read-time twin of :func:`with_ratio` for
    COUNT(DISTINCT)."""
    return rollup.withColumn(out_col, F.hll_sketch_estimate(sketch))


def with_quantile(
    rollup: DataFrame, out_col: str, sketch: str, q: float
) -> DataFrame:
    """Derive a quantile estimate from a stored ``kll`` sketch column
    — incremental percentiles without re-sorting anything: exact
    percentile needs every value (A2 keeps that form as the oracle);
    the sketch keeps O(log n) values per key, folds per batch, and
    answers any rank at read time within KLL's ~1.7% rank error."""
    return rollup.withColumn(
        out_col, F.kll_sketch_get_quantile_double(sketch, F.lit(float(q)))
    )

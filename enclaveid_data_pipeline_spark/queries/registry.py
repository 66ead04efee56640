"""Query registry backing ``__spark_entry__``.

Conventions every query/oracle pair follows (FIXTURES.md §5 plus
engine-portability rules learned the hard way):

- every computed column is explicitly aliased, identically on both
  sides (the driver sorts columns by name before hashing);
- timestamps are emitted as ``yyyy-MM-dd HH:mm:ss`` strings (Spark
  truncates parquet ns → µs; string form is engine-portable);
- durations are integer microseconds (exact in both engines), never
  float seconds;
- money math is DECIMAL end-to-end, cast to DOUBLE only in the final
  projection (bit-identical across engines; float sums are
  order-dependent and are not reproducible at scale);
- derived floats (percentiles, cosines, ratios) are ``round(x, 4)``
  on both sides;
- integer-valued aggregates are cast to BIGINT on the DuckDB side
  (DuckDB sums integers into HUGEINT, which pandas renders
  differently).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle)
        return fn

    return deco

#!/usr/bin/env python3
"""Isolated per-query timing: min-of-N GC-fenced, same count() action
as bench.py, plus an optional noop-sink timing (guide §1.4) to check
the count() number is not column-pruning away real work.

Usage: python3 scripts/qtime.py [--noop] [--sf DIR] [--runs N] query ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from enclaveid_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from enclaveid_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    noop = "--noop" in args
    if noop:
        args.remove("--noop")
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    spark = get_spark("qtime")
    # warmup (same as bench)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).collect()

    def fence() -> None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)

    for name in args:
        fn = REGISTRY[name].fn
        best = None
        for _ in range(runs):
            fence()
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        line = f"{name}: count={best:.3f}s ({n} rows)"
        if noop:
            best_n = None
            for _ in range(runs):
                fence()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best_n = dt if best_n is None else min(best_n, dt)
            line += f" noop={best_n:.3f}s"
        print(line)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

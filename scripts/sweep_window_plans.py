"""Sweep every registry query's physical plan for unpartitioned
ordered WindowExec nodes (the single-task total-order trap).

Usage: python scripts/sweep_window_plans.py [sf_dir]

Prints one line per offending (query, plan-line) pair plus a summary.
Used to build/maintain the allowlist in
tests/test_plan_quality.py::test_no_unpartitioned_windows_registry_wide.
"""

from __future__ import annotations

import sys
import traceback

sys.path.insert(0, "/root/repo")

from enclaveid_data_pipeline_spark.queries import REGISTRY
from enclaveid_data_pipeline_spark.session import get_spark


def unpartitioned_ordered_window_lines(plan: str) -> list[str]:
    out = []
    for line in plan.splitlines():
        # A partitioned+ordered Window renders three bracket groups
        # ([exprs], [partition], [order]) = two "], [" seams; one
        # seam is partitioned-unordered (fine) or unpartitioned-
        # ordered (the trap) — only the order group carries ASC/DESC.
        if "Window [" in line and line.count("], [") < 2:
            tail = line.rsplit("], [", 1)[-1]
            if " ASC" in tail or " DESC" in tail:
                out.append(line.strip())
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("window-sweep", master="local[4]", shuffle_partitions=4)
    hits: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, entry in sorted(REGISTRY.items()):
        try:
            df = entry.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception:
            errors[name] = traceback.format_exc(limit=2)
            continue
        lines = unpartitioned_ordered_window_lines(plan)
        bounded = "TakeOrderedAndProject" in plan or "GlobalLimit" in plan
        if lines:
            hits[name] = lines
            print(f"== {name}  (limit-below-in-plan={bounded})")
            for ln in lines:
                print(f"   {ln[:200]}")
    for name, tb in errors.items():
        print(f"!! {name} ERROR\n{tb}")
    print(
        f"\nswept {len(REGISTRY)} queries: {len(hits)} with "
        f"unpartitioned ordered windows, {len(errors)} errors"
    )


if __name__ == "__main__":
    main()

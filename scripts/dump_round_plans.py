#!/usr/bin/env python3
"""Dump per-query plan evidence files for an optimization round.

Writes plans/<round>/<query>_<tag>.txt containing the
``.explain("formatted")`` output (initial plan: PushedFilters /
ReadSchema / join strategy / Exchange placement) followed by the AQE
final executed plan (the shape that actually ran), at the judged SF.

Usage: python3 scripts/dump_round_plans.py <round> <tag> [query ...]
       (no queries -> the full bench HEADLINE suite)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from enclaveid_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from enclaveid_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "r12"
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or list(HEADLINE)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        rnd,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_round_plans")
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        df.count()  # finalize AQE
        final = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} [{tag}] at {SF_DIR}\n\n"
                f"== explain(formatted), initial plan ==\n{formatted}\n"
                f"== AQE final executed plan ==\n{final}\n"
            )
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Runs the headline query suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is timed to full materialization (count of a cached-free
plan — results are consumed, not collected to the driver). Session
startup is excluded; a warmup no-op JVM action runs first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from enclaveid_data_pipeline_spark.session import get_spark  # noqa: E402
from enclaveid_data_pipeline_spark.queries import REGISTRY  # noqa: E402

#: Headline suite: one per operator family (scan/agg, star join,
#: window top-k, learned-threshold sessionization, recency split,
#: MinHash LSH, Jaccard verify + its PPJoin scale path, all-pairs
#: graph, ANN brute/IVF, model operator, multi-way star shapes).
HEADLINE = (
    "q1_pricing_summary",
    "revenue_by_nation",
    "q3_shipping_priority",
    "q9_profit_by_nation_year",
    "q13_order_count_distribution",
    "top3_orders_per_customer",
    "customer_running_spend",
    "recency_split_3mo",
    "sessionize_learned_gap",
    "minhash_lsh_candidates",
    "ngram_jaccard_dups",
    "benchmark_contamination_4gram",
    "top1_neighbor_graph",
    "knn_bruteforce_top5",
    "knn_ivf_top5",
    "mock_embed_documents",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    # JVM + codegen + vectorized-parquet-reader warmup outside the
    # timed region (the first parquet scan JITs the whole read path)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).collect()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(
        10_000
    ).selectExpr("sum(l_quantity)").collect()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        per_query[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {per_query[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

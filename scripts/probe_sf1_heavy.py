"""One-off: sf1 min-of-2 timing of the three round-7 decade
additions (r6 verdict item 4). Writes JSON lines to stdout."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from enclaveid_data_pipeline_spark.queries import REGISTRY
from enclaveid_data_pipeline_spark.session import get_spark


def main() -> None:
    spark = get_spark("scale-probe2-sf1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sf1 = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1].startswith("/") else "/root/repo/testdata_scaled/sf1"
    names = [a for a in sys.argv[1:] if not a.startswith("/")] or [
        "dbscan_lsh_roles",
        "hybrid_search_fixedq",
        "dedup_method_consensus",
    ]
    for name in names:
        best = None
        for r in range(2):
            t0 = time.time()
            n = REGISTRY[name].fn(spark, sf1).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
            print(
                json.dumps({f"{sf1.rsplit(chr(47),1)[-1]}.{name}.run{r}": [round(dt, 2), n]}),
                flush=True,
            )
        print(json.dumps({f"{sf1.rsplit(chr(47),1)[-1]}.{name}": round(best, 2)}), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

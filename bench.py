"""Benchmark harness — runs every registered query end-to-end and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is measured with the noop sink (full plan runs distributed,
nothing is collected to the driver), which is the honest proxy for
cluster throughput. Data dir from $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), parallelism from $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_collection_ieee_spark import registry
from data_collection_ieee_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    registry.load_all()
    spark = get_spark("dcis-bench")

    # Warm up the JVM/codegen once on the flagship query.
    registry.QUERIES["agg_hash_group"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    per_query: dict[str, float] = {}
    for name in sorted(registry.QUERIES):
        t0 = time.time()
        df = registry.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.time() - t0, 3)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_clock_all_queries",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Local stand-in for the driver's correctness gate.

Runs every ``queries()[name]`` on Spark at sf0.01 and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then
compares row count, sorted column names, and an order-insensitive
canonicalized row multiset (strict proxy for the driver's value hash).
Queries without an oracle get a rows-only check.

Usage:
    python tools/check.py                 # all queries
    python tools/check.py agg_hash_group  # subset
    python tools/check.py --sf /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_collection_ieee_spark import oracle as orc  # noqa: E402
from data_collection_ieee_spark import registry  # noqa: E402
from data_collection_ieee_spark.session import get_spark  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    registry.load_all()
    names = args.names or sorted(registry.QUERIES)
    unknown = [n for n in names if n not in registry.QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        sys.exit(2)

    con = orc.oracle_connection(args.sf)
    spark = get_spark("dcis-check")
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            fn = registry.QUERIES[name]
            sql = registry.ORACLES.get(name)
            if sql is None:
                n = len(fn(spark, args.sf).collect())
                status, detail = "ROWS_ONLY", f"{n} rows, {time.time() - t0:.1f}s"
            else:
                problems = orc.compare(fn(spark, args.sf), con, sql)
                if problems:
                    status, detail = "FAIL", "; ".join(problems)
                else:
                    status, detail = "PASS", f"{time.time() - t0:.1f}s"
        except Exception as e:  # noqa: BLE001
            status, detail = "ERROR", f"{type(e).__name__}: {e}"
        if status in ("FAIL", "ERROR"):
            failures += 1
        print(f"{status:9s} {name:28s} {detail}", flush=True)
    print(f"\n{len(names) - failures}/{len(names)} ok")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

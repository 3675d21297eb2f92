"""Per-query profiling harness for optimization rounds (guide §1).

Runs named queries (default: all) in ONE warm session against
$SPARK_GRAFT_SF_DIR (default sf0.1), times each with the noop sink
REPS times (first run = cold-in-session, later runs = warm), labels
jobs via setJobDescription, and optionally captures
``explain("formatted")`` to a plans directory.

Usage:
    python tools/profile_query.py graph_pagerank graph_triangle_count
    python tools/profile_query.py --reps 3 --plans plans/r13 --suffix before g1 g2
    python tools/profile_query.py --all --reps 1
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_collection_ieee_spark import catalog, registry  # noqa: E402
from data_collection_ieee_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir for explain captures")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--json", default=None, help="write timings JSON here")
    args = ap.parse_args()

    registry.load_all()
    names = sorted(registry.QUERIES) if args.all else args.names
    unknown = [n for n in names if n not in registry.QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        sys.exit(2)

    spark = get_spark("dcis-profile")
    out: dict[str, list[float]] = {}
    for name in names:
        fn = registry.QUERIES[name]
        times: list[float] = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}#{rep}")
            t0 = time.time()
            try:
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
            except Exception as exc:  # noqa: BLE001
                print(f"{name:40s} ERROR {type(exc).__name__}: {exc}", flush=True)
                times.append(float("nan"))
                break
            finally:
                spark.sparkContext.setJobDescription(None)
                # Spark's CacheManager matches canonicalized plans, so a
                # persist_tracked frame from rep N silently serves rep N+1
                # (and even a LATER query with an identical sub-plan) —
                # that is cross-run result caching, not a warm measurement.
                # Release between reps so every rep recomputes from parquet.
                catalog.release_caches()
        out[name] = times
        print(f"{name:40s} " + " ".join(f"{t:7.2f}" for t in times), flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            try:
                buf = io.StringIO()
                with redirect_stdout(buf):
                    fn(spark, args.sf).explain("formatted")
                with open(
                    os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: explain failed: {exc}", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            # failed reps serialize as null, not bare NaN (invalid JSON)
            json.dump(
                {n: [t if t == t else None for t in ts] for n, ts in out.items()},
                f,
                indent=1,
                sort_keys=True,
            )
    # summary: warmest rep per query; all-NaN (errored-on-first-rep)
    # entries are skipped so min() never sees an empty sequence
    best = {
        n: min(t for t in ts if t == t)
        for n, ts in out.items()
        if any(t == t for t in ts)
    }
    print("TOTAL(best-rep): ", round(sum(best.values()), 2))


if __name__ == "__main__":
    main()

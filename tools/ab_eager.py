"""Interleaved A/B of the iteration-discipline gate (OPTIMIZATION r13).

Runs each named query alternately with SPARK_GRAFT_EAGER_ITER_BYTES=0
(eager — the pre-r13 campaign schedule) and the default gate (lazy at
bench scale), in ONE session, REPS times each, releasing caches between
runs. Interleaving cancels host noise; medians decide.

Usage: python tools/ab_eager.py [--reps 3] [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_collection_ieee_spark import catalog, registry  # noqa: E402
from data_collection_ieee_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark("dcis-ab-eager")
    for name in args.names:
        fn = registry.QUERIES[name]
        times: dict[str, list[float]] = {"eager": [], "lazy": []}
        # warm one throwaway run so JIT/codegen warmth is shared
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        catalog.release_caches()
        for _ in range(args.reps):
            for mode in ("eager", "lazy"):
                if mode == "eager":
                    os.environ["SPARK_GRAFT_EAGER_ITER_BYTES"] = "0"
                else:
                    os.environ.pop("SPARK_GRAFT_EAGER_ITER_BYTES", None)
                spark.sparkContext.setJobDescription(f"ab:{name}:{mode}")
                t0 = time.time()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                times[mode].append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
                catalog.release_caches()
        me, ml = statistics.median(times["eager"]), statistics.median(times["lazy"])
        print(
            f"{name:38s} eager={me:7.2f} lazy={ml:7.2f} "
            f"({ml / me:.2f}x)  raw e={times['eager']} l={times['lazy']}",
            flush=True,
        )


if __name__ == "__main__":
    main()

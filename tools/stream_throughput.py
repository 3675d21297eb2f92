"""Micro-batch replay throughput (VERDICT r8 item 7).

Measures the availableNow replay harness (streaming/parity.py) on the
generated events tables: wall time and rows/sec as a function of the
input-file count (= micro-batch count at maxFilesPerTrigger=1), for a
stateless windowed aggregation (tumbling daily counts) and the
stateful CUSUM kernel (applyInPandasWithState). The interesting
quantity is the per-batch overhead slope: state-store ops and batch
planning cost O(batches), so halving batch size should roughly double
neither — if wall time grows ~linearly with file count at fixed rows,
the per-batch constant dominates and bigger batches are the tuning
lever (at 100 TB: maxFilesPerTrigger / maxBytesPerTrigger sizing).

Staging (splitting events.parquet into N files) happens on first use
and is excluded: each configuration is staged + warmed once, then
timed.

Usage: SPARK_DRIVER_MEMORY=32g python tools/stream_throughput.py \
         [--sf /tmp/dcis_scale/sf1] [--files 1 4 16] [--reps 1]
Appends one JSON line per (op, n_files) to stdout and a summary table
suitable for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

from data_collection_ieee_spark.session import get_spark  # noqa: E402
from data_collection_ieee_spark.streaming import parity, stateful  # noqa: E402


def run_once(spark, sf_dir: str, n_files: int, op: str) -> float:
    events = parity.read_events_stream(
        spark, sf_dir, n_files=n_files, files_per_trigger=1
    )
    t0 = time.time()
    if op == "tumbling":
        parity.run_to_memory(parity.tumbling_daily(events), all_updates=True)
    else:
        parity.run_to_memory(stateful.cusum_drift(events), mode="update")
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/dcis_scale/sf1")
    ap.add_argument("--files", type=int, nargs="*", default=[1, 4, 16])
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    spark = get_spark("stream-throughput")
    n_rows = pq.read_metadata(os.path.join(args.sf, "events.parquet")).num_rows
    rows = []
    for op in ("tumbling", "cusum"):
        for nf in args.files:
            run_once(spark, args.sf, nf, op)  # stage + warm, untimed
            walls = sorted(run_once(spark, args.sf, nf, op) for _ in range(args.reps))
            wall = walls[len(walls) // 2]
            rec = {
                "op": op,
                "n_files": nf,
                "rows": n_rows,
                "wall_s": round(wall, 3),
                "rows_per_s": int(n_rows / wall),
                "sf": args.sf,
            }
            rows.append(rec)
            print(json.dumps(rec), flush=True)

    print("\n| op | files (= micro-batches) | wall s | rows/s |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['op']} | {r['n_files']} | {r['wall_s']} | "
            f"{r['rows_per_s']:,} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Driver-blind-spot correctness gate (VERDICT r7 item 8).

The grading driver has sampled the SAME ~50 queries every round, so
most of the surface is never driver-checked at sf0.01; the local full
gates cover it at sf0.001/0.01, but sf0.1 coverage of the blind spot
was ad-hoc spot-checks. This tool makes it protocol: it computes the
complement of every query name that has EVER appeared in a
CORRECTNESS_r*.json, picks a deterministic rotating window of 20
(rotation keyed by --round so successive rounds walk the whole
complement), runs the full DuckDB-oracle comparison at sf0.1 on them,
and appends one line to PROGRESS.jsonl:

  {"kind": "blindspot_gate", "round": N, "ok": true, "passed": 20,
   "failed": 0, "rows_only": K, "names": [...], ...}

Usage: python tools/blindspot_gate.py --round 8 [--n 20] [--sf DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def driver_sampled() -> set[str]:
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        data = json.load(open(path))
        queries = data.get("queries", data)
        if isinstance(queries, dict):
            seen.update(queries.keys())
    return seen


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-log", action="store_true")
    args = ap.parse_args()

    from data_collection_ieee_spark import registry

    registry.load_all()
    complement = sorted(set(registry.QUERIES) - driver_sampled())
    if not complement:
        print("no blind spot: every query has appeared in a driver sample")
        return 0
    # rotating window over the sorted complement, keyed by round number
    # so consecutive rounds cover fresh ground before wrapping
    start = (args.round * args.n) % len(complement)
    picked = [
        complement[(start + i) % len(complement)]
        for i in range(min(args.n, len(complement)))
    ]
    print(
        f"blind spot {len(complement)} queries; round {args.round} window: "
        f"{picked}"
    )

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "check.py"), "--sf", args.sf]
        + picked,
        capture_output=True,
        text=True,
    )
    wall = time.time() - t0
    out = proc.stdout + proc.stderr
    passed = sum(1 for ln in out.splitlines() if ln.startswith("PASS"))
    rows_only = sum(1 for ln in out.splitlines() if ln.startswith("ROWS_ONLY"))
    failed = sum(
        1 for ln in out.splitlines() if ln.startswith(("FAIL", "ERROR"))
    )
    for ln in out.splitlines():
        if ln.startswith(("PASS", "ROWS_ONLY", "FAIL", "ERROR")):
            print(ln)
    ok = failed == 0 and (passed + rows_only) == len(picked)

    line = {
        "kind": "blindspot_gate",
        "ts": time.time(),
        "round": args.round,
        "sf": args.sf,
        "wall_s": round(wall, 1),
        "ok": ok,
        "passed": passed,
        "rows_only": rows_only,
        "failed": failed,
        "names": picked,
    }
    print(json.dumps(line))
    if not args.no_log:
        with open(os.path.join(ROOT, "PROGRESS.jsonl"), "a") as f:
            f.write(json.dumps(line) + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

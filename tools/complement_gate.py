"""Ever-driver-sampled complement gate (VERDICT r12 #3).

The closing protocol's OTHER half: `blindspot_gate.py` covers the
queries the driver has never sampled; this tool runs the full
DuckDB-oracle comparison at sf0.1 over every query that HAS appeared
in a CORRECTNESS_r*.json — the set whose round-N health previously
lived only in a BASELINE.md paragraph and a commit message (the r9
evidence-loss failure mode). Appends one machine-readable line to
PROGRESS.jsonl:

  {"kind": "complement_gate", "round": N, "ok": true, "passed": P,
   "rows_only": K, "failed": 0, "names": [...], ...}

Usage: python tools/complement_gate.py --round 13 [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.blindspot_gate import driver_sampled  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-log", action="store_true")
    args = ap.parse_args()

    from data_collection_ieee_spark import registry

    registry.load_all()
    # intersect with the live registry: a renamed/retired query in an
    # old CORRECTNESS file must not fail the gate as "unknown"
    picked = sorted(driver_sampled() & set(registry.QUERIES))
    if not picked:
        print("no driver-sampled queries found")
        return 0
    print(f"ever-driver-sampled complement: {len(picked)} queries at {args.sf}")

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
    failed = sum(1 for ln in out.splitlines() if ln.startswith(("FAIL", "ERROR")))
    for ln in out.splitlines():
        if ln.startswith(("FAIL", "ERROR")):
            print(ln)
    ok = failed == 0 and (passed + rows_only) == len(picked)

    line = {
        "kind": "complement_gate",
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

"""Streaming correctness gate (VERDICT r6 item 6).

The Structured Streaming parity harness (streaming/parity.py,
streaming/stateful.py, exercised by tests/test_streaming.py) was
pytest-only — green in CI but never a logged round artifact like the
oracle gate. This gate runs that availableNow parity suite under a
runtime bound and appends one JSON line to PROGRESS.jsonl:

  {"kind": "stream_gate", "ts": ..., "passed": N, "failed": N,
   "errors": N, "wall_s": ..., "ok": true}

Run as part of the round-close protocol:
  python tools/stream_gate.py [--timeout 900]
Exit 0 iff every parity test passed within the bound.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=900, help="seconds")
    ap.add_argument(
        "--no-log", action="store_true", help="don't append to PROGRESS.jsonl"
    )
    args = ap.parse_args()

    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_streaming.py", "-q"],
            cwd=ROOT,
            capture_output=True,
            text=True,
            timeout=args.timeout,
        )
        tail = (proc.stdout or "") + (proc.stderr or "")
        timed_out = False
    except subprocess.TimeoutExpired as exc:
        tail = ((exc.stdout or b"").decode("utf-8", "replace")
                + (exc.stderr or b"").decode("utf-8", "replace"))
        timed_out = True
    wall = round(time.time() - t0, 1)

    # pytest summary line: "12 passed", "1 failed", "2 errors" / "1 error"
    counts = {"passed": 0, "failed": 0, "errors": 0}
    for key, pat in (
        ("passed", r"(\d+) passed"),
        ("failed", r"(\d+) failed"),
        ("errors", r"(\d+) errors?"),
    ):
        m = re.search(pat, tail)
        if m:
            counts[key] = int(m.group(1))
    ok = (
        not timed_out
        and counts["passed"] > 0
        and counts["failed"] == 0
        and counts["errors"] == 0
    )

    record = {
        "kind": "stream_gate",
        "ts": time.time(),
        "wall_s": wall,
        "timed_out": timed_out,
        "ok": ok,
        **counts,
    }
    print(json.dumps(record))
    if not ok:
        # surface the pytest tail so the failure is diagnosable from logs
        print(tail[-2000:])
    if not args.no_log:
        with open(os.path.join(ROOT, "PROGRESS.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

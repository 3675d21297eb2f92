"""Generate BASELINE_FROZEN.json — the ONE canonical frozen-baseline
table (VERDICT r6 item 8).

BASELINE.md accumulated per-round addenda in several table shapes
(first-freeze 2-col, re-freeze with the operative value in either the
're-frozen' or 'new frozen' column, prose-annotated freezes), and every
ratio consumer had to re-implement the same last-wins parse with the
same trap list. This script is that parse, ONCE:

- a table participates iff its header has a `query…` column and a
  value column whose header starts with `sec`/`frozen` or contains
  `re-frozen`/`new frozen` (re-freeze columns win over `old` columns
  by header name, not position — both historical orders exist);
- scale-trend tables (ratio columns) and status tables are excluded;
- document order is freeze order: LAST WINS per query.

Output: BASELINE_FROZEN.json at the repo root,
{"frozen": {query: sec}, "source": "BASELINE.md", "n": N}.
`bench.py --check` reads it and reports every query's ratio vs its
freeze (the 2x rule). Regenerate after appending any new freeze table
to BASELINE.md:  python tools/freeze_baseline.py
"""

from __future__ import annotations

import json
import os
import re
import sys


def parse_baseline_md(path: str) -> dict[str, float]:
    lines = open(path).read().split("\n")
    frozen: dict[str, float] = {}
    i = 0
    while i < len(lines):
        l = lines[i]
        if (
            l.startswith("|")
            and i + 1 < len(lines)
            and re.match(r"^\|[-:| ]+\|?$", lines[i + 1])
        ):
            hdr = [c.strip().lower() for c in l.strip("|").split("|")]
            name_col = next(
                (k for k, h in enumerate(hdr) if h.startswith("query")), None
            )
            # re-freeze value columns are named, not positional: both
            # "| query | re-frozen | old |" and "| query | old | new |"
            # orders exist in the history
            val_col = next(
                (
                    k
                    for k, h in enumerate(hdr)
                    if "re-frozen" in h or "new frozen" in h
                ),
                None,
            )
            if val_col is None:
                val_col = next(
                    (
                        k
                        for k, h in enumerate(hdr)
                        if h.startswith("sec") or h.startswith("frozen")
                    ),
                    None,
                )
            has_ratio = any("ratio" in h for h in hdr)
            j = i + 2
            while j < len(lines) and lines[j].startswith("|"):
                if name_col is not None and val_col is not None and not has_ratio:
                    cells = [c.strip() for c in lines[j].strip("|").split("|")]
                    if len(cells) > max(name_col, val_col):
                        name = cells[name_col].strip("`* ")
                        val = cells[val_col].strip("`* ")
                        if re.fullmatch(r"\d+(\.\d+)?", val) and re.fullmatch(
                            r"[a-z0-9_]+", name
                        ):
                            frozen[name] = float(val)
                j += 1
            i = j
        else:
            i += 1
    return frozen


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    frozen = parse_baseline_md(os.path.join(root, "BASELINE.md"))
    out = {"source": "BASELINE.md (last-wins parse)", "n": len(frozen), "frozen": frozen}
    with open(os.path.join(root, "BASELINE_FROZEN.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"BASELINE_FROZEN.json written: {len(frozen)} frozen queries")
    # the four historically mis-parsed entries — assert the named-column
    # logic got them right so a regression in this parser is loud
    expect = {
        "win_ntile_dense": 0.886,
        "sim_pairwise_labels": 1.485,
        "sort_multi": 1.524,
        # re-frozen in Addendum 15 (r14, driver-settled values) — the
        # canary still exercises last-wins parsing across THREE freezes
        "dedup_simhash": 1.4,
    }
    bad = {k: (frozen.get(k), v) for k, v in expect.items() if frozen.get(k) != v}
    if bad:
        print(f"PARSE REGRESSION on known-tricky entries: {bad}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

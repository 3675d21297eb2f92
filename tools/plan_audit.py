"""Physical-plan audit: run every registered query's explain() and flag
plans that would not survive a 100× scale-up.

Checks per query (heuristics over `explain("formatted")` text):
- SCAN_WIDE:     a parquet scan whose ReadSchema carries every table
                 column even though the query projects a subset
                 (column pruning failed).
- NO_PUSHDOWN:   query filters on a scanned column but the scan shows
                 no PushedFilters entry.
- CARTESIAN:     CartesianProduct / BroadcastNestedLoopJoin outside the
                 queries that are cross joins by design.
- NO_BROADCAST:  a join against a tiny dimension (region/nation/
                 supplier/centroids) executed as sort-merge/shuffle
                 instead of broadcast-hash.
- NO_CODEGEN:    no WholeStageCodegen span anywhere (fully interpreted
                 plan) for a query with no Python/Arrow stage.
- GLOBAL_WINDOW: a partitionBy-less Window (single-partition sort of
                 its whole input) whose child is NOT a bounded top-k
                 node (TakeOrderedAndProject / GlobalLimit) — the
                 scale-killer pattern VERDICT r4 flagged on
                 sim_ann_hyperplane; this check keeps it from coming
                 back on ANY query, top-k-shaped ones especially
                 (sim_cosine_topk, sim_ann_ivf, sim_ann_hyperplane,
                 topk_limit, win_rank_topk).

Usage: python tools/plan_audit.py [--sf DIR] [-v] [name ...]
Writes PLANS.md at the repo root with one row per query.
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from data_collection_ieee_spark.session import get_spark  # noqa: E402

# cross joins / intentionally-broadcast-nested-loop ops
CROSS_OK = {
    "join_cross",
    "join_theta_range",
    "sim_cosine_topk",
    "sim_pairwise_labels",
    "text_wordcount_tfidf",  # 1-row corpus-size scalar rides a broadcast nested loop
    "text_top_terms",  # composes text_wordcount_tfidf: same 1-row scalar broadcast
    "text_token_rarity",  # 1-row corpus-moments scalar rides a broadcast nested loop
    "pipeline_doc_scorecard",  # composes text_token_rarity: same 1-row scalar broadcast
    "sim_ann_ivf",  # probe × 16-row centroid table: broadcast nested loop by design
    "sim_ann_hyperplane",  # 1-row probe rides a broadcast nested loop by design
    "stats_ks_source",  # |sources| × distinct-values ECDF grid: bounded cross join by design
    "graph_triangle_count",  # final assembly of FOUR 1-row scalars (nodes/edges/triangles/wedge mass) rides broadcast nested loops; the wedge and closing joins are equi-joins
    "graph_triangle_sample",  # same 1-row scalar assembly (sampled edges x triangle count); the wedge and closing joins are equi-joins
    "stats_chi2_independence",  # 1-row grand-total + source/lang margin scalars ride broadcast nested loops over the ≤tens-of-cells contingency table
    "sample_hash_split",  # 1-row corpus-total share denominator broadcast onto the 3-row split table
    "embed_centroid_drift",  # 1-row global-norm scalar broadcast onto the ≤|labels|-row centroid table
    "tpch_q22_idle_capital",  # 1-row positive-balance mean broadcast onto customer as the scalar-subquery threshold
    "agg_heavy_hitters",  # 1-row corpus-token-total scalar broadcast onto the ≤K-candidate count frame
    "orders_market_basket",  # 1-row order-count scalar broadcast onto the frequent-pair frame for support/lift
    "stats_psi_drift",  # 1-row time-midpoint scalar + 5-row-bounds broadcasts; domain = types × range(10), bounded
    "text_unigram_perplexity",  # 1-row corpus-total scalar rides a broadcast nested loop onto the token stream
    "stats_benford_digits",  # 1-row digit-total scalar broadcast onto the ≤9-cell digit frame
    "text_pmi_collocations",  # two 1-row totals broadcast onto the vocabulary²-bounded pair frame
    "orders_rfm_segments",  # 1-row quintile-boundaries frame broadcast onto the per-customer aggregate (scalar-subquery shape)
    "stats_token_deciles",  # 9-row decile literal broadcast against the ranked frame — bounded fan-out by construction
}
# roundtrip sinks re-read their own CSV/JSON output with a bare scan —
# nothing above the scan to fuse, so the absence of a codegen span is
# expected, not a regression
BARE_SCAN_OK = {"scan_csv_roundtrip", "scan_json_roundtrip"}
# ops with Python (Arrow) stages — codegen absence is expected there
PY_STAGES = {
    "dedup_embed_cosine",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "udaf_pandas",
    "udf_pandas",
    "udf_scalar",
    "udtf_surface",
    "sim_ann_ivf",
}
DIM_TABLES = ("region", "nation")


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_one(name: str, df) -> tuple[list[str], str]:
    # Execute first: with AQE on, codegen ids and final join strategies
    # only appear in the plan once isFinalPlan=true (count() would
    # execute a DIFFERENT plan, so collect the real one).
    df.collect()
    txt = plan_text(df)
    flags: list[str] = []

    scans = re.findall(r"Scan parquet[^\n]*\n(?:.*\n)*?(?=\(\d+\)|\Z)", txt)
    if "PartitionFilters" in txt and "PushedFilters: \\[\\]" in txt:
        pass

    # SCAN_WIDE: ReadSchema listing > 8 fields is suspicious for most ops
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", txt):
        n_cols = len([c for c in m.group(1).split(",") if c.strip()])
        if n_cols >= 12:
            flags.append(f"SCAN_WIDE({n_cols})")
            break

    if "Filter" in txt and "Scan parquet" in txt:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", txt)
        if pushed and all(not p.strip() for p in pushed) and "isnotnull" in txt.lower():
            # filters exist in plan but none reached any scan
            if name not in PY_STAGES:
                flags.append("NO_PUSHDOWN")

    if name not in CROSS_OK and (
        "CartesianProduct" in txt or "BroadcastNestedLoopJoin" in txt
    ):
        flags.append("CARTESIAN")

    if any(t in txt for t in DIM_TABLES) and "SortMergeJoin" in txt:
        if "BroadcastHashJoin" not in txt:
            flags.append("NO_BROADCAST_DIM")

    # formatted-mode marker for whole-stage codegen is "[codegen id : N]"
    if "codegen id" not in txt and name not in PY_STAGES and name not in BARE_SCAN_OK:
        flags.append("NO_CODEGEN")

    if _has_unbounded_global_window(txt):
        flags.append("GLOBAL_WINDOW")

    # sim_knn_join's query side must enter through the cogrouped
    # shuffle (FlatMapCoGroupsInPandas), never a driver collect()
    # closed over the kernel — the r5-flagged scale-killer shape. A
    # collect is invisible in the plan, but its absence of the cogroup
    # node is not: the fixed implementation always shows one.
    if name == "sim_knn_join" and "FlatMapCoGroupsInPandas" not in txt:
        flags.append("KNN_NO_COGROUP")

    # join_partition_pruned exists to demonstrate dynamic partition
    # pruning: its fact scan must carry a dynamicpruningexpression in
    # PartitionFilters (the runtime subquery fed by the filtered dim).
    # Its absence means the layout or join shape regressed to a
    # full-corpus scan.
    if name == "join_partition_pruned" and "dynamicpruning" not in txt.lower():
        flags.append("NO_DPP")

    return flags, txt


# tree nodes that bound their output to ~k rows, making a global window
# over them harmless (the window sorts k rows, not the corpus)
_BOUNDED_CHILDREN = ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit")


def _has_unbounded_global_window(txt: str) -> bool:
    """True iff some Window node (a) has NO partition spec — its formatted
    `Arguments:` carries only [window exprs], [order spec], i.e. a single
    top-level `], [` separator instead of two — and (b) its direct child
    in the plan tree is not a bounded top-k node. Such a window moves its
    ENTIRE input through one partition (Spark itself warns 'Moving all
    data to a single partition')."""
    # node id -> partitionBy-less?  (from the per-node detail sections).
    # Arguments prints only the non-empty spec lists:
    #   [exprs]                       — no partition, no order: GLOBAL
    #   [exprs], [p#1, p#2]           — partitioned, no order: fine
    #   [exprs], [k#1 DESC, k#2 ASC]  — no partition, ordered: GLOBAL sort
    #   [exprs], [p#1], [k#1 ASC]     — partitioned + ordered: fine
    # so a window is global iff it has <3 lists and the last list is not
    # a bare partition-column list (order entries carry ASC/DESC).
    global_win: set[str] = set()
    for m in re.finditer(r"\((\d+)\) Window\b[^\n]*\n(?:[^\n]*\n)*?Arguments: (.*)", txt):
        lists = m.group(2).split("], [")
        if len(lists) == 1 or (
            len(lists) == 2 and re.search(r"\b(ASC|DESC)\b", lists[-1])
        ):
            global_win.add(m.group(1))
    if not global_win:
        return False
    # tree section: a Window line's child is the next tree line; its
    # subtree is the run of following lines at strictly deeper indent
    tree_lines = [l for l in txt.split("\n\n", 1)[0].splitlines() if re.search(r"\(\d+\)\s*$", l)]

    def depth(line: str) -> int:
        return len(re.match(r"[\s:+\-*]*", line).group(0))

    for i, line in enumerate(tree_lines):
        m = re.search(r"Window(?:GroupLimit)? \((\d+)\)\s*$", line)
        if not m or m.group(1) not in global_win or "WindowGroupLimit" in line:
            continue
        child = tree_lines[i + 1] if i + 1 < len(tree_lines) else ""
        if any(b in child for b in _BOUNDED_CHILDREN):
            continue
        # a grouped aggregate anywhere below bounds the window's input to
        # the group-key cardinality (e.g. shares over a per-(source,lang)
        # rollup) — tiny by construction, and cheaper than re-scanning
        # the base table once per share column. Only a global window fed
        # by O(scan) rows is the scale hazard.
        d = depth(line)
        subtree = []
        for nxt in tree_lines[i + 1:]:
            if depth(nxt) <= d:
                break
            subtree.append(nxt)
        if not any("Aggregate" in s for s in subtree):
            return True
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    spark = get_spark("plan-audit")
    queries = entrymod.queries()
    names = args.names or sorted(queries)

    rows = []
    n_flagged = 0
    for name in names:
        try:
            df = queries[name](spark, args.sf)
            flags, txt = audit_one(name, df)
        except Exception as exc:  # pragma: no cover
            flags, txt = [f"ERROR:{type(exc).__name__}"], str(exc)
        status = " ".join(flags) if flags else "ok"
        if flags:
            n_flagged += 1
            if args.verbose:
                print(f"=== {name}: {status}\n{txt}\n")
        rows.append((name, status))
        print(f"{'FLAG' if flags else 'ok':5} {name:30} {status}")

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    if args.names and os.path.exists(path):
        # subset run: MERGE into the existing full table instead of
        # clobbering it down to the subset's rows (round-11 footgun)
        merged = {}
        for line in open(path):
            m = line.strip()
            if m.startswith("| `"):
                # maxsplit=1: a status containing "|" must not explode
                q, st = m.strip("|").split("|", 1)
                merged[q.strip().strip("`")] = st.strip()
        merged.update(dict(rows))
        # prune rows for queries renamed/removed from the registry —
        # otherwise stale names persist in PLANS.md forever (ADVICE r11)
        merged = {q: st for q, st in merged.items() if q in queries}
        rows = sorted(merged.items())
    with open(path, "w") as f:
        f.write("# Physical-plan audit\n\n")
        f.write(f"Generated by `tools/plan_audit.py` at sf dir `{args.sf}`.\n\n")
        f.write("Heuristic flags: SCAN_WIDE (column pruning failed), NO_PUSHDOWN "
                "(predicates not reaching the scan), CARTESIAN (unintended nested-loop), "
                "NO_BROADCAST_DIM (dimension join not broadcast), NO_CODEGEN "
                "(fully interpreted plan without a Python stage to excuse it), "
                "GLOBAL_WINDOW (unbounded partitionBy-less window — single-partition "
                "sort of its whole input).\n\n")
        f.write("| query | audit |\n|---|---|\n")
        for name, status in rows:
            f.write(f"| `{name}` | {status} |\n")
    print(f"\n{len(rows) - n_flagged}/{len(rows)} clean; PLANS.md written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""ANN recall-at-scale curve (VERDICT r6 item 7; list scaling r7 item 7).

The recall pytests run at fixture scale (sf0.001, 20 vectors of
ground truth); this tool measures recall@k vs probe effort for both
ANN operators on the GENERATED scale embeddings (tools/gen_scale.py)
— the scale where list routing actually matters — and records the
curves into SCALE_TREND.json under "ann_recall" (keyed by sf dir, so
sf1 and sf10 curves coexist).

- sim_ann_ivf:        recall@20 for n_probe over a grid derived from
                      the √N-scaled list count: {1, nl/16, nl/8,
                      nl/4 (the default), nl/2, nl}; nl = all lists
                      ⇒ recall 1.0
- sim_ann_hyperplane: recall@20 for probe hamming radius ∈ {0..4}
                      (default 1; 4 = all 16 buckets ⇒ recall 1.0)

Pass/fail: each curve must be monotone non-decreasing in probe effort,
reach 1.0 at the exhaustive setting, and meet the floors: IVF ≥ 0.85
at the default n_probe = n_lists/4 (the r7 VERDICT sf10 criterion),
LSH ≥ 0.25 at radius=1 (the tests/test_llm_ops.py floor).

Usage: python tools/ann_recall.py [--sf /tmp/dcis_scale/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_collection_ieee_spark import registry  # noqa: E402
from data_collection_ieee_spark.session import get_spark  # noqa: E402


def topk_ids(df, expect_k: int | None = None) -> set[int]:
    """Distinct result ids, asserting the result is well-formed: no
    duplicate vec_id (a duplicate would silently undercount k in the
    recall denominator) and, when ``expect_k`` is given, exactly that
    many rows (an empty exact baseline previously surfaced as a bare
    ZeroDivisionError)."""
    ids = [r["vec_id"] for r in df.collect()]
    s = set(ids)
    if len(s) != len(ids):
        raise SystemExit(f"top-k result repeats vec_ids: {sorted(ids)}")
    if expect_k is not None and len(ids) != expect_k:
        raise SystemExit(
            f"exact top-k returned {len(ids)} rows, expected {expect_k} — "
            "is the embeddings table present and ≥ k+1 rows?"
        )
    return s


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/dcis_scale/sf1")
    args = ap.parse_args()

    registry.load_all()
    from data_collection_ieee_spark.operators.similarity import (
        TOP_K,
        _ann_hyperplane_impl,
        _ann_ivf_impl,
        _ivf_n_lists,
    )

    spark = get_spark("ann-recall")
    exact = topk_ids(
        registry.QUERIES["sim_cosine_topk"](spark, args.sf), expect_k=TOP_K
    )
    k = len(exact)

    n_vecs = spark.read.parquet(f"{args.sf}/embeddings.parquet").count()
    n_lists = _ivf_n_lists(n_vecs)
    probe_grid = sorted(
        {1, n_lists // 16, n_lists // 8, n_lists // 4, n_lists // 2, n_lists} - {0}
    )
    default_probe = max(4, n_lists // 4)

    curves = {
        "sf_dir": args.sf,
        "k": k,
        "n_vecs": n_vecs,
        "n_lists": n_lists,
        "default_probe": default_probe,
        "ivf": {},
        "hyperplane": {},
    }
    for n_probe in probe_grid:
        ann = topk_ids(_ann_ivf_impl(spark, args.sf, n_probe=n_probe))
        curves["ivf"][str(n_probe)] = round(len(exact & ann) / k, 3)
    for radius in (0, 1, 2, 3, 4):
        ann = topk_ids(_ann_hyperplane_impl(spark, args.sf, probe_hamming=radius))
        curves["hyperplane"][str(radius)] = round(len(exact & ann) / k, 3)

    print(f"n_vecs {n_vecs}, n_lists {n_lists}, default n_probe {default_probe}")
    print("IVF recall@{} by n_probe:        {}".format(k, curves["ivf"]))
    print("hyperplane recall@{} by radius:  {}".format(k, curves["hyperplane"]))

    def monotone(d):
        v = [d[key] for key in sorted(d, key=int)]
        return all(a <= b for a, b in zip(v, v[1:]))

    ok = (
        monotone(curves["ivf"])
        and monotone(curves["hyperplane"])
        and curves["ivf"][str(n_lists)] == 1.0
        and curves["hyperplane"]["4"] == 1.0
        and curves["ivf"][str(default_probe)] >= 0.85
        and curves["hyperplane"]["1"] >= 0.25
    )
    curves["ok"] = ok
    print("monotone + exhaustive=1.0 + default-floor checks:", "OK" if ok else "FAIL")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trend_path = os.path.join(root, "SCALE_TREND.json")
    trend = json.load(open(trend_path)) if os.path.exists(trend_path) else {}
    # keyed by sf basename so curves at several scales coexist; the r6
    # flat "ann_recall" entry (sf1 only) is superseded on first write
    entry = trend.get("ann_recall")
    if not isinstance(entry, dict) or "ivf" in entry:
        entry = {}
    entry[os.path.basename(args.sf.rstrip("/"))] = curves
    trend["ann_recall"] = entry
    with open(trend_path, "w") as f:
        json.dump(trend, f, indent=1)
    print("SCALE_TREND.json ann_recall written")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""ANN recall-at-scale curve (VERDICT r6 item 7).

The recall pytests run at fixture scale (sf0.001, 20 vectors of
ground truth); this tool measures recall@k vs probe effort for both
ANN operators on the GENERATED sf1 embeddings (20k vectors,
tools/gen_scale.py) — the scale where list routing actually matters —
and records the curves into SCALE_TREND.json under "ann_recall".

- sim_ann_ivf:        recall@20 for n_probe ∈ {1, 2, 4, 8, 16}
                      (default 4; 16 = scan all lists ⇒ recall 1.0)
- sim_ann_hyperplane: recall@20 for probe hamming radius ∈ {0..4}
                      (default 1; 4 = all 16 buckets ⇒ recall 1.0)

Pass/fail: each curve must be monotone non-decreasing in probe effort,
reach 1.0 at the exhaustive setting, and meet the fixture-scale bounds
at the default setting (IVF ≥ 0.3 at n_probe=4, LSH ≥ 0.25 at
radius=1 — the tests/test_llm_ops.py floors).

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


def topk_ids(df) -> set[int]:
    return {r["vec_id"] for r in df.collect()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/dcis_scale/sf1")
    args = ap.parse_args()

    registry.load_all()
    from data_collection_ieee_spark.operators.similarity import (
        _ann_hyperplane_impl,
        _ann_ivf_impl,
    )

    spark = get_spark("ann-recall")
    exact = topk_ids(registry.QUERIES["sim_cosine_topk"](spark, args.sf))
    k = len(exact)

    curves = {"sf_dir": args.sf, "k": k, "ivf": {}, "hyperplane": {}}
    for n_probe in (1, 2, 4, 8, 16):
        ann = topk_ids(_ann_ivf_impl(spark, args.sf, n_probe=n_probe))
        curves["ivf"][str(n_probe)] = round(len(exact & ann) / k, 3)
    for radius in (0, 1, 2, 3, 4):
        ann = topk_ids(_ann_hyperplane_impl(spark, args.sf, probe_hamming=radius))
        curves["hyperplane"][str(radius)] = round(len(exact & ann) / k, 3)

    print("IVF recall@{} by n_probe:        {}".format(k, curves["ivf"]))
    print("hyperplane recall@{} by radius:  {}".format(k, curves["hyperplane"]))

    def monotone(d):
        v = [d[key] for key in sorted(d, key=int)]
        return all(a <= b for a, b in zip(v, v[1:]))

    ok = (
        monotone(curves["ivf"])
        and monotone(curves["hyperplane"])
        and curves["ivf"]["16"] == 1.0
        and curves["hyperplane"]["4"] == 1.0
        and curves["ivf"]["4"] >= 0.3
        and curves["hyperplane"]["1"] >= 0.25
    )
    curves["ok"] = ok
    print("monotone + exhaustive=1.0 + default-floor checks:", "OK" if ok else "FAIL")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trend_path = os.path.join(root, "SCALE_TREND.json")
    trend = json.load(open(trend_path)) if os.path.exists(trend_path) else {}
    trend["ann_recall"] = curves
    with open(trend_path, "w") as f:
        json.dump(trend, f, indent=1)
    print("SCALE_TREND.json ann_recall written")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Round-13 operator tests: ANN-backed KNN join (VERDICT r12 #6).

The equality test is the strong one: at n_probe = n_lists the IVF
routing admits every list, so the operator must reproduce the exact
block-nested-loop join ROW FOR ROW (same kernel, same rounding, same
tie-breaks) — any drift in the cogroup kernel or window key fails it
bit-exactly. The recall test then pins the default probe depth's
quality against the exact result.
"""

from __future__ import annotations

import pytest


def _knn_rows(df):
    return {(r["q_id"], r["vec_id"], r["cos_sim"], r["rank"]) for r in df.collect()}


def _neighbors(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


@pytest.fixture(scope="module")
def exact_knn(spark, sf_dir):
    from data_collection_ieee_spark.operators.similarity import _knn_join_impl

    return _knn_join_impl(spark, sf_dir).collect()


def test_knn_join_ann_full_probe_equals_exact(spark, sf_dir, exact_knn):
    from data_collection_ieee_spark.operators.similarity import (
        _knn_join_ann_impl,
    )

    exact = {(r["q_id"], r["vec_id"], r["cos_sim"], r["rank"]) for r in exact_knn}
    full = _knn_rows(_knn_join_ann_impl(spark, sf_dir, n_probe=10**6))
    assert full == exact


def test_knn_join_ann_default_recall(spark, sf_dir, exact_knn):
    from data_collection_ieee_spark.operators.similarity import (
        _KNN_K,
        sim_knn_join_ann,
    )

    exact_nb = {}
    for r in exact_knn:
        exact_nb.setdefault(r["q_id"], set()).add(r["vec_id"])
    ann_nb = _neighbors(sim_knn_join_ann(spark, sf_dir))
    assert set(ann_nb) == set(exact_nb)  # every query answered
    recalls = [
        len(ann_nb[q] & exact_nb[q]) / min(_KNN_K, len(exact_nb[q]))
        for q in exact_nb
    ]
    mean_recall = sum(recalls) / len(recalls)
    # deterministic build → this is exact, not flaky: measured 0.660 at
    # sf0.001 (490 vectors, 4 of 13 lists probed). IVF recall rises
    # with corpus size (sim_ann_ivf measured 0.95 at sf10 probing
    # 1/320 of lists); the floor is a smoke gate — the equality and
    # monotonicity tests carry the correctness weight.
    assert mean_recall >= 0.60, f"mean recall {mean_recall:.3f} < 0.60"


def test_knn_join_ann_recall_monotone_in_probes(spark, sf_dir, exact_knn):
    from data_collection_ieee_spark.operators.similarity import (
        _knn_join_ann_impl,
    )

    exact_nb = {}
    for r in exact_knn:
        exact_nb.setdefault(r["q_id"], set()).add(r["vec_id"])

    def mean_recall(df):
        nb = _neighbors(df)
        return sum(
            len(nb.get(q, set()) & exact_nb[q]) / len(exact_nb[q])
            for q in exact_nb
        ) / len(exact_nb)

    r1 = mean_recall(_knn_join_ann_impl(spark, sf_dir, n_probe=1))
    r_full = mean_recall(_knn_join_ann_impl(spark, sf_dir, n_probe=10**6))
    assert r1 <= r_full + 1e-12
    assert r_full == pytest.approx(1.0)

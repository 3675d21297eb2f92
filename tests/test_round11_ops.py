"""Round-11 additions: triangle-count bounded-pass equality (the
VERDICT r10 #1 device), DOULION-style sampled triangle estimate, and
the connected-users CC consumer view.

The pass-mode test is the graph twin of the shingle-family campaign
equality test (test_llm_ops.py): K sharded wedge passes must produce
byte-identical output to the single-pass plan, because sharding on the
wedge join key (src) is lossless by construction.
"""

from __future__ import annotations

import pandas as pd
import pytest

from data_collection_ieee_spark.catalog import release_caches
from data_collection_ieee_spark.operators import dedup
from data_collection_ieee_spark.operators.graph import graph_triangle_count

SF001 = "/root/testdata/sf0.001"


def _write_baskets(tmp_path, baskets):
    rows = [
        {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": 1}
        for ok, parts in baskets
        for pk in parts
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "lineitem.parquet")


def test_triangle_pass_mode_equals_single_pass(spark, tmp_path, monkeypatch):
    """K=3 sharded wedge passes == single-pass, on a motif fixture with
    triangles spread across src shards (3 disjoint triangles + one K4
    = 3 + 4 triangles), plus pass_stats evidence recorded."""
    _write_baskets(
        tmp_path,
        [
            (1, [1, 2, 3]),
            (2, [11, 12, 13]),
            (3, [21, 22, 23]),
            (4, [31, 32, 33, 34]),  # K4: C(4,3) = 4 triangles
        ],
    )
    single = graph_triangle_count(spark, str(tmp_path)).collect()
    release_caches()
    monkeypatch.setenv(dedup.PAIR_PASSES_ENV, "3")
    passed = graph_triangle_count(spark, str(tmp_path)).collect()
    release_caches()
    assert single == passed
    assert single[0]["n_triangles"] == 7
    stats = dedup.PASS_STATS["triangle_count"]
    assert len(stats) == 3
    assert all(s["wall_s"] > 0 for s in stats)


def test_triangle_pass_mode_equals_single_pass_sf001(spark, monkeypatch):
    """Same equality on the real fixture (denser graph, every shard
    non-trivial)."""
    single = graph_triangle_count(spark, SF001).collect()
    release_caches()
    monkeypatch.setenv(dedup.PAIR_PASSES_ENV, "4")
    passed = graph_triangle_count(spark, SF001).collect()
    release_caches()
    assert single == passed
    assert single[0]["n_triangles"] > 0

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


def test_triangle_sample_p100_equals_exact(spark, tmp_path, monkeypatch):
    """With the sampling coin forced to p=1.0 the sparsified graph IS
    the full graph, so t_sampled must equal the exact triangle count
    and the estimate must be 8x it (the 1/p^3 constant is pinned at
    p=0.5 by contract)."""
    from data_collection_ieee_spark.operators import graph as G

    _write_baskets(tmp_path, [(1, [1, 2, 3]), (2, [31, 32, 33, 34])])
    monkeypatch.setattr(G, "_DOULION_PCT", 100)
    r = G.graph_triangle_sample(spark, str(tmp_path)).collect()[0]
    release_caches()
    assert r["n_sampled_edges"] == 3 + 6
    assert r["t_sampled"] == 5  # 1 + C(4,3)
    assert r["est_triangles"] == 40


def test_triangle_sample_subgraph_of_exact(spark):
    """At the contract p=0.5: sampled edge count is a strict subset of
    the full edge list, and the estimate is exactly 8 * t_sampled."""
    from data_collection_ieee_spark.operators.graph import (
        graph_triangle_sample,
    )

    full = graph_triangle_count(spark, SF001).collect()[0]
    release_caches()
    r = graph_triangle_sample(spark, SF001).collect()[0]
    release_caches()
    assert 0 < r["n_sampled_edges"] < full["n_edges"]
    assert r["est_triangles"] == 8 * r["t_sampled"]


def test_connected_users_vs_union_find(spark):
    """Community labels == a driver-side union-find over the same
    affinity edges (independent implementation agreement, the
    CC-kernel verification pattern from dedup_cluster_assign)."""
    from collections import Counter

    from data_collection_ieee_spark.operators import graph as G

    rows = G.graph_connected_users(spark, SF001).collect()
    release_caches()
    # rebuild the edge list independently with plain pandas
    import pandas as pd

    li = pd.read_parquet(f"{SF001}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    od = pd.read_parquet(f"{SF001}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cp = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")[
        ["o_custkey", "l_partkey"]
    ].drop_duplicates()
    m = cp.merge(cp, on="l_partkey")
    m = m[m.o_custkey_x < m.o_custkey_y]
    shared = m.groupby(["o_custkey_x", "o_custkey_y"]).size()
    edges = [k for k, v in shared.items() if v >= G._SHARED_PARTS_MIN]
    parent = {}

    def find(a):
        parent.setdefault(a, a)
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for u, v in edges:
        ra, rb = find(u), find(v)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    got = {r["custkey"]: r["cluster_id"] for r in rows}
    assert got == want
    sizes = Counter(want.values())
    assert all(r["cluster_size"] == sizes[r["cluster_id"]] for r in rows)


# ---- streaming recovery: kill MID-REPLAY, restart from checkpoint ----
#
# The pre-existing restart test (test_streaming.py) stops a query at a
# QUIET point (all staged files processed) before landing new data.
# This one kills the query BETWEEN micro-batches of one logical replay
# — the crash-recovery case the exactly-once claim actually rests on —
# and asserts the recovered end state is bit-identical to an
# uninterrupted run for all three stateful kernels (VERDICT r10 #3).

import time

import pytest

from data_collection_ieee_spark.streaming import parity, stateful

_N_FILES = 8


def _run_stream(spark, build_df, out, ckpt, stop_after_first_progress=False):
    """Start the availableNow query on `build_df()`; optionally stop it
    as soon as the first micro-batch commits (mid-replay kill). Returns
    wall seconds."""
    t0 = time.time()
    q = (
        stateful.idempotent_parquet_sink(build_df(), out)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if stop_after_first_progress:
        while q.isActive and not q.recentProgress:
            time.sleep(0.02)
        q.stop()
    q.awaitTermination()
    return time.time() - t0


def _final_state(spark, out, key):
    """Per-key FINAL row across the batch=N emissions (update mode emits
    per touched batch; the last batch containing a key holds its final
    state)."""
    df = spark.read.parquet(out)  # hive-partitioned: adds `batch` col
    rows = df.collect()
    best = {}
    for r in rows:
        d = r.asDict()
        b = d.pop("batch")
        k = d.pop(key)
        val = tuple(tuple(v) if isinstance(v, list) else v for v in d.values())
        if k not in best or b > best[k][0]:
            best[k] = (b, val)
    return {k: v for k, (_b, v) in best.items()}


@pytest.mark.parametrize(
    "kernel,key",
    [
        (stateful.running_user_totals, "user_id"),
        (stateful.cusum_drift, "event_type"),
        (stateful.heavy_hitters, "event_type"),
    ],
    ids=["running_totals", "cusum", "heavy_hitters"],
)
def test_kill_midreplay_recovers_exact_state(spark, tmp_path, kernel, key):
    sf_dir = "/root/testdata/sf0.01"

    def build():
        return kernel(
            parity.read_events_stream(
                spark, sf_dir, n_files=_N_FILES, files_per_trigger=1
            )
        )

    # uninterrupted reference run
    out_u, ckpt_u = str(tmp_path / "sink_u"), str(tmp_path / "ckpt_u")
    _run_stream(spark, build, out_u, ckpt_u)

    # interrupted run: kill after the FIRST committed micro-batch. The
    # stop races the stream — on a fast run all 8 micro-batches can
    # commit before the stop lands, which makes the attempt useless
    # (nothing left to recover), not wrong. Retry with fresh dirs; skip
    # only if every attempt drains fully (ADVICE r11).
    import os
    import shutil

    out_i, ckpt_i = str(tmp_path / "sink_i"), str(tmp_path / "ckpt_i")
    first_ids: set[int] = set()
    for _attempt in range(4):
        shutil.rmtree(out_i, ignore_errors=True)
        shutil.rmtree(ckpt_i, ignore_errors=True)
        _run_stream(spark, build, out_i, ckpt_i, stop_after_first_progress=True)
        first_ids = {
            int(d.split("=")[1])
            for d in os.listdir(out_i)
            if d.startswith("batch=")
        }
        # …the kill landed mid-replay (some of the 8 micro-batches pending)
        if 0 < len(first_ids) < _N_FILES:
            break
    else:
        pytest.skip("stream drained all micro-batches before every kill")
    assert 0 < len(first_ids) < _N_FILES
    # …then restart from the checkpoint and drain the rest
    recovery_wall = _run_stream(spark, build, out_i, ckpt_i)
    all_ids = {
        int(d.split("=")[1])
        for d in os.listdir(out_i)
        if d.startswith("batch=")
    }
    assert len(all_ids) > len(first_ids)

    # recovered end state == uninterrupted end state, per key, exactly
    assert _final_state(spark, out_i, key) == _final_state(spark, out_u, key)
    assert recovery_wall > 0

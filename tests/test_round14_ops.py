"""Round-14 optimization internals.

Every change this round is schedule/plan-shape only — results must be
bit-identical. These tests pin the equalities the optimizations rely on:

- graph_assortativity now forks on the iteration gate (moments form at
  campaign scale, xy form below it); both forms must agree to the bit.
- catalog.load_table memoizes the READER PLAN per (session, sf_dir,
  table) — a plan handle, never data; the memo must be keyed by live
  session and must not leak across scale-factor dirs.
- connected_components persists its pair input for the probe/edge/label
  consumers; the pair cache must be released at kernel exit (no storage
  leak on top of the existing checkpoint-release contract).
"""

from __future__ import annotations

import os

import pytest

from data_collection_ieee_spark import catalog, registry

registry.load_all()

SF_A = "/root/testdata/sf0.001"


def test_assortativity_moments_form_bit_equal(spark):
    """The eager-gate moments restructure (one edge join + degree-table
    moments) must reproduce the xy form's output EXACTLY — same exact
    integer multiset sums, same final double."""
    fn = registry.QUERIES["graph_assortativity"]
    os.environ["SPARK_GRAFT_EAGER_ITER_BYTES"] = "0"  # force moments form
    try:
        eager_rows = fn(spark, SF_A).collect()
    finally:
        os.environ.pop("SPARK_GRAFT_EAGER_ITER_BYTES", None)
    catalog.release_caches()
    lazy_rows = fn(spark, SF_A).collect()
    catalog.release_caches()
    assert eager_rows == lazy_rows
    assert len(eager_rows) == 1 and eager_rows[0]["n_directed_edges"] > 0


def test_load_table_memoizes_reader_plan_per_session(spark):
    """Same (session, sf_dir, name) → same DataFrame object (a plan
    handle — no data is cached); a different sf_dir must get a fresh
    reader, and the memo must never confuse tables."""
    a1 = catalog.load_table(spark, SF_A, "orders")
    a2 = catalog.load_table(spark, SF_A, "orders")
    assert a1 is a2
    b = catalog.load_table(spark, "/root/testdata/sf0.01", "orders")
    assert b is not a1
    c = catalog.load_table(spark, SF_A, "lineitem")
    assert c is not a1 and "l_orderkey" in c.columns
    # the memo holds no persisted blocks — nothing for release to drop
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    catalog.load_table(spark, SF_A, "customer")
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before


def test_cc_kernel_releases_pair_cache(spark):
    """connected_components persists its pair input (r14); kernel exit
    must unpersist it together with the edge cache so a campaign loop
    cannot accumulate pair caches."""
    from data_collection_ieee_spark.operators.dedup import connected_components

    catalog.release_caches()
    base = spark.sparkContext._jsc.getPersistentRDDs().size()
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "a_id bigint, b_id bigint"
    )
    nodes = spark.createDataFrame([(i,) for i in range(21)], "doc_id bigint")
    connected_components(spark, pairs, nodes).count()
    catalog.release_caches()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == base


@pytest.mark.parametrize("eager", [True, False])
def test_cc_labels_identical_under_pair_persist(spark, eager):
    """The pair persist is schedule-only: labels must match a driver
    union-find regardless of schedule."""
    from data_collection_ieee_spark.operators.dedup import connected_components

    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 10)]
    nodes_l = [1, 2, 3, 10, 11, 20, 21, 22, 30]
    pairs = spark.createDataFrame(edges, "a_id bigint, b_id bigint")
    nodes = spark.createDataFrame([(i,) for i in nodes_l], "doc_id bigint")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(spark, pairs, nodes, eager=eager).collect()
    }
    # reference union-find
    parent = {n: n for n in nodes_l}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: min(m for m in nodes_l if find(m) == find(n)) for n in nodes_l}
    catalog.release_caches()
    assert got == want

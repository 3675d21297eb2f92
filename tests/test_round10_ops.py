"""Focused semantics tests for the round-10 additions and ADVICE r9
edge fixes: agg_percentile_disc (nearest-rank boundaries),
graph_triangle_count (hand-built motif), agg_heavy_hitters NULL text,
stats_psi_drift one-sided-half type drop. Each pins an edge the
fixtures may never exercise; fixture-scale parity stays with the
DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_collection_ieee_spark.operators.aggregates import (
    agg_heavy_hitters,
    agg_percentile_disc,
)
from data_collection_ieee_spark.operators.graph import graph_triangle_count
from data_collection_ieee_spark.operators.stats import stats_psi_drift


def _write(df, tmp_path, name):
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"{name}.parquet"))


def test_percentile_disc_nearest_rank_boundaries(spark, tmp_path):
    # one flag, values 10..100 x1 each (n=10): the exact-integer
    # boundaries where float ceil(q*n) is off by one. quantile_disc
    # semantics: rank ceil(q*n) -> p25=30, p50=50, p75=80, p95=100.
    rows = [("A", float((i + 1) * 10)) for i in range(10)]
    # second flag with repeated values exercises the CDF containment:
    # [1,1,1,2] (n=4) -> p25=1 (rank 1), p50=1 (rank 2), p75=1 (rank
    # 3), p95=2 (rank 4)
    rows += [("B", 1.0), ("B", 1.0), ("B", 1.0), ("B", 2.0)]
    df = spark.createDataFrame(rows, "l_returnflag string, l_quantity double")
    _write(df, tmp_path, "lineitem")
    got = {r["l_returnflag"]: r for r in agg_percentile_disc(spark, str(tmp_path)).collect()}
    a = got["A"]
    assert (a["n"], a["p25"], a["p50"], a["p75"], a["p95"]) == (10, 30.0, 50.0, 80.0, 100.0)
    b = got["B"]
    assert (b["n"], b["p25"], b["p50"], b["p75"], b["p95"]) == (4, 1.0, 1.0, 1.0, 2.0)


def test_triangle_count_hand_motif(spark, tmp_path):
    # orders as baskets: {1,2,3} closes a triangle; {3,4} dangles.
    # co-purchase edges: (1,2),(1,3),(2,3),(3,4) -> 1 triangle.
    # wedges sum C(d,2): d = {1:2, 2:2, 3:3, 4:1} -> 1+1+3+0 = 5;
    # clustering = 3*1/5 = 0.6.
    rows = [(100, 1), (100, 2), (100, 3), (200, 3), (200, 4)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    _write(df, tmp_path, "lineitem")
    r = graph_triangle_count(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 4
    assert r["n_edges"] == 4
    assert r["n_triangles"] == 1
    assert abs(r["global_clustering"] - 0.6) < 1e-9


def test_triangle_count_bipartite_is_zero(spark, tmp_path):
    # two disjoint baskets of 2: edges (1,2),(3,4) -> path-free graph,
    # zero wedges -> clustering NULL (0/0 guarded by round(3t/w))
    rows = [(1, 1), (1, 2), (2, 3), (2, 4)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    _write(df, tmp_path, "lineitem")
    r = graph_triangle_count(spark, str(tmp_path)).collect()[0]
    assert r["n_triangles"] == 0
    # wedge mass: every node degree 1 -> sum C(1,2) = 0 -> NULL ratio
    assert r["global_clustering"] is None


def test_heavy_hitters_null_text_skipped(spark, tmp_path):
    # ADVICE r9: a NULL text row must not crash the MG sketch and must
    # contribute zero tokens, matching string_split(NULL) -> [].
    rows = [(1, "x x x x", "en", "s", 7), (2, None, "en", "s", 0), (3, "x y", "en", "s", 3)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    _write(df, tmp_path, "documents")
    got = {r["token"]: r for r in agg_heavy_hitters(spark, str(tmp_path)).collect()}
    # corpus = 6 tokens (4+2), x has 5 > 6/200 -> heavy
    assert got["x"]["cnt"] == 5
    assert abs(got["x"]["share"] - 5 / 6) < 1e-6


def test_psi_drift_drops_one_sided_types(spark, tmp_path):
    # type 'only_first' exists solely before the midpoint: its q-half
    # share would be 0/0 — the ADVICE fix drops it in both engines.
    rows = [
        ("drift", "2024-01-01 00:00:00", 1.0, 1),
        ("drift", "2024-01-10 00:00:00", 9.0, 1),
        ("only_first", "2024-01-02 00:00:00", 5.0, 1),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, value double, user_id long"
    ).select("event_type", F.col("ts").cast("timestamp").alias("ts"), "value", "user_id")
    _write(df, tmp_path, "events")
    out = stats_psi_drift(spark, str(tmp_path)).collect()
    types = {r["event_type"] for r in out}
    assert "only_first" not in types
    assert "drift" in types

"""Work-growth normalization for the intrinsically-pairwise trend
queries (round 7; the methodology precedent is round 6's
dedup_simhash output-growth measurement — measure the denominator,
don't assert it).

Two operators' TOTAL work is not linear in rows by CONTRACT, so their
decade time ratio must be read against measured WORK growth, not row
growth:

- `sim_knn_join`: the fixture derives the query set from the corpus
  (every 50th vec_id), so scoring work = |queries| × |base| ∝ N². A
  production workload holds Q fixed; per-(query,base-row) work is the
  honest unit.
- `dedup_embed_cosine` (and `dedup_semantic_keep`, which composes it):
  exact all-pairs threshold search. The triangle-inequality list prune
  is exactness-preserving, and on CLUSTERED corpora (the real dedup
  case) it removes most list pairs — but the generated fixture
  embeddings are isotropic standard normals (no planted structure), so
  at cos ≥ 0.45 (θ ≈ 63°) essentially no list pair is prunable and the
  admissible block volume stays ≈ N²/2. This tool REPLICATES the
  operator's centroid/radius/prune arithmetic in numpy and reports the
  admissible volume Σ|Li|·|Lj| at both scales — the true work measure.

Writes per-query {work_ratio, work_unit, time_per_work_ratio} into the
given decade of SCALE_TREND.json. time_per_work_ratio ≤ ~1.3 means the
plan is linear in its work; > that is a real plan bug.

Usage: python tools/trend_worknorm.py [--base sf1dir] [--big sf10dir]
       [--label sf1->sf10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KNN_QMOD = 50  # operators/similarity.py _KNN_QMOD
N_LISTS = 16  # operators/dedup.py _embed_cosine_pairs
COS_THR = 0.45  # operators/dedup.py COSINE_DUP_THRESHOLD


def load_emb(sf_dir: str):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    vec_id = t["vec_id"].to_numpy()
    emb = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    return vec_id, emb


def knn_work(vec_id: np.ndarray) -> int:
    q = int((vec_id % KNN_QMOD == 0).sum())
    return q * (len(vec_id) - q)


def embed_cosine_work(vec_id: np.ndarray, emb: np.ndarray) -> int:
    """Admissible sub-block volume Σ|Li||Lj| with the operator's exact
    centroid / radius / triangle-inequality arithmetic (block
    subdivision does not change the volume, so it is ignored)."""
    buckets = (vec_id % N_LISTS).astype(int)
    cents = np.zeros((N_LISTS, emb.shape[1]))
    for b in range(N_LISTS):
        m = emb[buckets == b]
        if len(m):
            cents[b] = m.mean(axis=0)
    cent_norms = np.linalg.norm(cents, axis=1) + 1e-300
    cos = (emb @ cents.T) / (
        np.linalg.norm(emb, axis=1)[:, None] * cent_norms[None, :] + 1e-300
    )
    list_id = cos.argmax(axis=1)
    own = cos.max(axis=1)
    sizes = np.bincount(list_id, minlength=N_LISTS)
    radius = np.zeros(N_LISTS)
    for lst in range(N_LISTS):
        o = own[list_id == lst]
        radius[lst] = np.arccos(np.clip(o.min(), -1, 1)) if len(o) else 0.0
    theta = np.arccos(COS_THR)
    cc = (cents @ cents.T) / np.outer(cent_norms, cent_norms)
    vol = 0
    live = [lst for lst in range(N_LISTS) if sizes[lst]]
    for a_i, i in enumerate(live):
        for j in live[a_i:]:
            ang = float(np.arccos(np.clip(cc[i, j], -1, 1)))
            if ang > theta + radius[i] + radius[j]:
                continue
            vol += int(sizes[i]) * int(sizes[j]) if i != j else int(
                sizes[i]
            ) * (int(sizes[i]) - 1) // 2
    return vol


def shingle_candidate_mass(sf_dir: str) -> int:
    """Candidate volume of the postings count-join, Σ_h C(df_h, 2) —
    the exact row count the shingle self-join emits (before the a<b
    halving it is 2x this). One cheap Spark aggregate over the shared
    shingle frame; linear in postings."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from data_collection_ieee_spark.operators.dedup import _shingles_df
    from data_collection_ieee_spark.session import get_spark

    spark = get_spark("trend-worknorm")
    df = (
        _shingles_df(spark, sf_dir)
        .select(F.explode("hs").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("df"))
        .agg(F.sum(F.expr("df * (df - 1) DIV 2")).alias("mass"))
        .first()["mass"]
    )
    return int(df)


SHINGLE_QUERIES = (
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cluster_assign",
    # round 8: the threshold-free sweep and containment run the same
    # postings count-join, so their work denominator is the same
    # candidate mass
    "dedup_threshold_sweep",
    "dedup_containment",
)


def incremental_candidate_mass(sf_dir: str) -> int:
    """Candidate volume of dedup_incremental_snapshot's stage-2 join:
    Σ_h df_left(h)·df_right(h) over the dirty-restricted left postings
    and all-representative right postings — the exact pre-filter row
    count of its candidate join (r8: measured, not approximated by the
    full-corpus mass, which would overstate the dirty-restricted
    work)."""
    from pyspark.sql import functions as F

    from data_collection_ieee_spark.operators.dedup import _incremental_parts
    from data_collection_ieee_spark.session import get_spark

    spark = get_spark("trend-worknorm")
    _, _, left, right = _incremental_parts(spark, sf_dir)
    lc = left.groupBy("h").agg(F.count("*").alias("l"))
    rc = right.groupBy("h").agg(F.count("*").alias("r"))
    mass = (
        lc.join(rc, "h")
        .agg(F.sum(F.col("l") * F.col("r")).alias("mass"))
        .first()["mass"]
    )
    # SUM over an empty inner join is NULL: no dirty-left posting
    # shares a hash with any right posting ⇒ candidate mass is zero
    return int(mass or 0)


def overlap_output_rows(sf_dir: str) -> int:
    """Result cardinality of join_session_overlap — the indisputable
    work lower bound for an operator whose OUTPUT is quadratic in
    co-active density (r8 profile: 99.8× per data decade on the
    fixed-span generator)."""
    from data_collection_ieee_spark import registry
    from data_collection_ieee_spark.session import get_spark

    spark = get_spark("trend-worknorm")
    return registry.QUERIES["join_session_overlap"](spark, sf_dir).count()


def simhash_output_rows(sf_dir: str) -> int:
    """Result cardinality of dedup_simhash — the work lower bound for
    an operator whose OUTPUT (near-dup pairs at hamming ≤ 3) grows
    with the planted dup-family mass, not linearly in rows; r6
    measured ~60x pairs at 10x docs on the generated corpora, which is
    what its bare 58x time ratio tracks (VERDICT r9 item 4: attach the
    denominator to the entry instead of leaving it prose)."""
    from data_collection_ieee_spark import registry
    from data_collection_ieee_spark.session import get_spark

    spark = get_spark("trend-worknorm")
    return registry.QUERIES["dedup_simhash"](spark, sf_dir).count()


def triangle_wedge_mass(sf_dir: str, sampled: bool) -> int:
    """Oriented wedge mass Σ_src C(outdeg_src, 2) of the co-purchase
    graph under the operator's own degree-ordered orientation — the
    EXACT row count the triangle wedge self-join emits, i.e. the work
    denominator for graph_triangle_count (and its DOULION-sampled twin
    when ``sampled``). Replays the operator's edge build + orientation
    and stops at the per-src combination count (one aggregate, never
    the wedge join itself)."""
    from pyspark.sql import functions as F

    from data_collection_ieee_spark.operators import graph as G
    from data_collection_ieee_spark.session import get_spark

    spark = get_spark("trend-worknorm")
    edges = G._copurchase_edges(spark, sf_dir)
    if sampled:
        edges = edges.filter(G._edge_coin_spark() < G._DOULION_PCT)
    deg = (
        edges.select(F.col("x").alias("v"))
        .unionAll(edges.select(F.col("y").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    dx = deg.select(F.col("v").alias("x"), F.col("d").alias("d_x"))
    dy = deg.select(F.col("v").alias("y"), F.col("d").alias("d_y"))
    lower_first = (F.col("d_x") < F.col("d_y")) | (
        (F.col("d_x") == F.col("d_y")) & (F.col("x") < F.col("y"))
    )
    orient = (
        edges.join(dx, "x")
        .join(dy, "y")
        .select(F.when(lower_first, F.col("x")).otherwise(F.col("y")).alias("src"))
    )
    mass = (
        orient.groupBy("src")
        .agg(F.count("*").alias("o"))
        .agg(F.sum(F.expr("o * (o - 1) DIV 2")).alias("mass"))
        .first()["mass"]
    )
    return int(mass or 0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/dcis_scale/sf1")
    ap.add_argument("--big", default="/tmp/dcis_scale/sf10")
    ap.add_argument("--label", default="sf1->sf10")
    ap.add_argument(
        "--shingles",
        action="store_true",
        help="also measure the shingle-family candidate mass (needs Spark)",
    )
    ap.add_argument(
        "--simhash",
        action="store_true",
        help="also measure dedup_simhash's output-pair work (needs Spark)",
    )
    ap.add_argument(
        "--triangles",
        action="store_true",
        help="also measure the oriented wedge mass for the triangle "
        "queries (needs Spark)",
    )
    args = ap.parse_args()

    works: dict[str, dict[str, float]] = {}
    if all(
        os.path.exists(os.path.join(d, "embeddings.parquet"))
        for d in (args.base, args.big)
    ):
        for tag, sf_dir in (("base", args.base), ("big", args.big)):
            vec_id, emb = load_emb(sf_dir)
            works.setdefault("sim_knn_join", {})[tag] = knn_work(vec_id)
            vol = embed_cosine_work(vec_id, emb)
            works.setdefault("dedup_embed_cosine", {})[tag] = vol
            works.setdefault("dedup_semantic_keep", {})[tag] = vol
    else:
        print("embeddings.parquet missing at one endpoint; skipping embed work")
    if args.shingles:
        from data_collection_ieee_spark import catalog, registry

        registry.load_all()
        for tag, sf_dir in (("base", args.base), ("big", args.big)):
            mass = shingle_candidate_mass(sf_dir)
            catalog.release_caches()
            for q in SHINGLE_QUERIES:
                works.setdefault(q, {})[tag] = mass
            works.setdefault("dedup_incremental_snapshot", {})[tag] = (
                incremental_candidate_mass(sf_dir)
            )
            catalog.release_caches()
            # events-dependent work only where the endpoint has events
            # (the documents-only sf100 fixture set does not)
            if os.path.exists(os.path.join(sf_dir, "events.parquet")):
                works.setdefault("join_session_overlap", {})[tag] = (
                    overlap_output_rows(sf_dir)
                )
                catalog.release_caches()
    if args.simhash:
        from data_collection_ieee_spark import catalog, registry

        registry.load_all()
        for tag, sf_dir in (("base", args.base), ("big", args.big)):
            works.setdefault("dedup_simhash", {})[tag] = simhash_output_rows(sf_dir)
            catalog.release_caches()
    if args.triangles:
        from data_collection_ieee_spark import catalog

        for tag, sf_dir in (("base", args.base), ("big", args.big)):
            works.setdefault("graph_triangle_count", {})[tag] = (
                triangle_wedge_mass(sf_dir, sampled=False)
            )
            catalog.release_caches()
            works.setdefault("graph_triangle_sample", {})[tag] = (
                triangle_wedge_mass(sf_dir, sampled=True)
            )
            catalog.release_caches()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trend_path = os.path.join(root, "SCALE_TREND.json")
    trend = json.load(open(trend_path))
    decade = trend["decades"][args.label]
    unit = {
        "sim_knn_join": "query x base-row scores (Q grows with N by fixture contract)",
        "dedup_embed_cosine": "admissible block volume sum(|Li|*|Lj|) after the exact triangle prune (isotropic fixture: prune cannot bite)",
        "dedup_semantic_keep": "same volume as dedup_embed_cosine (it composes that kernel + linear CC)",
        "dedup_ngram_jaccard": "postings count-join candidate mass sum_h C(df_h,2)",
        "dedup_minhash_lsh": "verification candidate mass bounded by the same sum_h C(df_h,2)",
        "dedup_cluster_assign": "pair-graph construction = the jaccard candidate mass; CC rounds are log-bounded",
        "dedup_threshold_sweep": "threshold-free postings count-join candidate mass sum_h C(df_h,2)",
        "dedup_containment": "same postings count-join candidate mass as the sweep",
        "dedup_incremental_snapshot": "dirty-restricted candidate mass sum_h df_left(h)*df_right(h)",
        "join_session_overlap": "output pair cardinality (co-active pairs are quadratic in temporal density; fixed-span generator => ~100x per decade)",
        "dedup_simhash": "output pair cardinality at hamming <= 3 (planted dup families make pairs superlinear in docs on the generated corpora)",
        "graph_triangle_count": "oriented wedge mass sum_src C(outdeg,2) — the exact wedge-join row count (fixture holds avg degree ~constant, so this grows ~E x deg, superlinear by fixture contract)",
        "graph_triangle_sample": "oriented wedge mass of the p=0.5 sparsified graph (~p^2 of the full mass)",
    }
    for name, w in works.items():
        if name not in decade["queries"] or {"base", "big"} - set(w):
            continue
        entry = decade["queries"][name]
        work_ratio = w["big"] / w["base"]
        entry["work_base"] = int(w["base"])
        entry["work_big"] = int(w["big"])
        entry["work_ratio"] = round(work_ratio, 2)
        entry["time_per_work_ratio"] = round(entry["ratio"] / work_ratio, 3)
        entry["work_unit"] = unit[name]
        print(
            f"{name:24} time {entry['ratio']:6.2f}x  work {work_ratio:6.2f}x"
            f"  time/work {entry['time_per_work_ratio']:.3f}"
        )
    with open(trend_path, "w") as f:
        json.dump(trend, f, indent=1)
    print("SCALE_TREND.json annotated")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Round-7 scale-pattern tests (VERDICT r6 items 2-4):

- dedup_incremental_snapshot == full-corpus dedup_ngram_jaccard
  restricted to pairs touching the new batch, and its candidate join's
  left side carries only dirty-group representatives (no old×old
  candidate generation).
- join_partition_pruned: dynamic partition pruning subquery present in
  the executed plan; result matches the unpartitioned star join.
- AQE skew-join split: OptimizeSkewedJoin fires on a planted hot-key
  shuffle join (plan-asserted by node marker), and the AQE-split
  result matches both the unsplit and the manually-salted forms.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_collection_ieee_spark.registry import QUERIES


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------------------
# dedup_incremental_snapshot


def test_incremental_equals_full_restricted(spark, sf_dir):
    """old∪new incremental output == full-corpus dedup_ngram_jaccard
    restricted to pairs with at least one new-batch side (VERDICT r6
    item 3's done-criterion), on the shared numeric columns."""
    from data_collection_ieee_spark.operators.dedup import _INCR_NEW_MOD

    inc = QUERIES["dedup_incremental_snapshot"](spark, sf_dir)
    full = QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
    new = _INCR_NEW_MOD - 1
    restricted = full.filter(
        (F.col("a_id") % _INCR_NEW_MOD == new)
        | (F.col("b_id") % _INCR_NEW_MOD == new)
    )
    cols = ["a_id", "b_id", "inter", "uni", "jaccard"]
    assert _rows(inc, cols) == _rows(restricted, cols)


def test_incremental_pair_labels_consistent(spark, sf_dir):
    """pair_kind says 'exact' iff the two texts are byte-identical;
    pair_scope says 'new_new' iff both sides are in the new batch."""
    from data_collection_ieee_spark.catalog import load_table
    from data_collection_ieee_spark.operators.dedup import _INCR_NEW_MOD

    inc = QUERIES["dedup_incremental_snapshot"](spark, sf_dir).collect()
    assert inc, "fixture must contain pairs touching the new batch"
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    new = _INCR_NEW_MOD - 1
    for r in inc:
        assert (r["pair_kind"] == "exact") == (
            texts[r["a_id"]] == texts[r["b_id"]]
        ), r
        both_new = (
            r["a_id"] % _INCR_NEW_MOD == new and r["b_id"] % _INCR_NEW_MOD == new
        )
        assert (r["pair_scope"] == "new_new") == both_new, r
        assert (
            r["a_id"] % _INCR_NEW_MOD == new or r["b_id"] % _INCR_NEW_MOD == new
        ), r


def test_incremental_no_old_x_old_candidates(spark, sf_dir):
    """The candidate join's LEFT side is restricted to representatives
    of dirty groups (≥1 new member): its posting count must equal the
    dirty-rep posting mass and be well below the full posting mass —
    the snapshot's df² never enters candidate generation."""
    from data_collection_ieee_spark.operators.dedup import (
        _incremental_parts,
        _shingles_df,
    )

    members, groups, left, right = _incremental_parts(spark, sf_dir)
    total_postings = (
        _shingles_df(spark, sf_dir).select(F.explode("hs")).count()
    )
    dirty_reps = {r["rep"] for r in groups.filter(F.col("dirty") == 1).collect()}
    left_rows = left.collect()
    assert {r["l_id"] for r in left_rows} <= dirty_reps
    # ~20% of docs are new ⇒ dirty-rep postings ≪ total postings
    assert len(left_rows) < 0.5 * total_postings
    # and the filter is in the PLAN, not just this materialization —
    # assert on the Filter node's condition specifically, not any
    # projection that merely mentions the column (r7 ADVICE)
    import re

    plan = left._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"Filter .*\(dirty#\d+L? = 1\)", plan), plan


# ---------------------------------------------------------------------------
# join_partition_pruned (dynamic partition pruning)


def test_dpp_subquery_in_plan_and_result_parity(spark, sf_dir):
    from data_collection_ieee_spark.catalog import load_table
    from data_collection_ieee_spark.functions.exact import dsum
    from data_collection_ieee_spark.operators.joins import _DPP_REGION

    df = QUERIES["join_partition_pruned"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan

    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    expected = (
        cu.join(na, cu.c_nationkey == na.n_nationkey)
        .join(re, na.n_regionkey == re.r_regionkey)
        .filter(F.col("r_name") == _DPP_REGION)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("sum_acctbal"))
        .select(F.col("n_name").alias("nation"), "n_customers", "sum_acctbal")
    )
    cols = ["nation", "n_customers", "sum_acctbal"]
    assert _rows(df, cols) == _rows(expected, cols)


# ---------------------------------------------------------------------------
# AQE skew-join split (VERDICT r6 item 2)

_HOT_FRACTION = 0.9
_N_LEFT = 400_000
_N_RIGHT = 2_000
_N_SALTS = 16


@pytest.fixture(scope="module")
def skew_tables(spark):
    """Planted hot-key fixture: 90% of the fact rows hit key 0, the dim
    side has one row per key. Sized so one shuffle partition's bytes
    exceed the lowered skew threshold and AQE must split it."""
    fact = spark.range(_N_LEFT).select(
        F.when(
            F.col("id") % 10 < int(_HOT_FRACTION * 10), F.lit(0)
        )
        .otherwise(F.col("id") % _N_RIGHT)
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
        # padding widens rows so the hot partition crosses the lowered
        # skewedPartitionThresholdInBytes without needing 100M rows
        F.repeat(F.lit("x"), 64).alias("pad"),
    )
    dim = spark.range(_N_RIGHT).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    )
    return fact, dim


def _skew_join_agg(fact, dim):
    """The shuffle join under test, reduced to a deterministic digest."""
    j = fact.join(dim, "k").select("k", (F.col("v") + F.col("w")).alias("s"))
    return j.groupBy((F.col("k") % 16).alias("g")).agg(
        F.count("*").alias("n"), F.sum("s").alias("sum_s")
    )


def _with_confs(spark, confs):
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    return saved


def _restore_confs(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_skew_split_fires_and_matches_salted(spark, skew_tables):
    """OptimizeSkewedJoin must fire on the planted hot key (asserted by
    the `skew=true` marker AQE stamps on the split SortMergeJoin), and
    the split join's result must equal (a) the same join with the skew
    optimizer disabled and (b) the manual salt-and-replicate form —
    the round-6 `join_salted_skew` technique."""
    fact, dim = skew_tables
    confs = {
        # force the sort-merge path (broadcast would hide the skew) and
        # lower AQE's skew thresholds to fixture scale
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = _with_confs(spark, confs)
    try:
        split = _skew_join_agg(fact, dim)
        split_rows = _rows(split, ["g", "n", "sum_s"])
        plan = split._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan  # OptimizeSkewedJoin's marker

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        unsplit_rows = _rows(_skew_join_agg(fact, dim), ["g", "n", "sum_s"])
        assert split_rows == unsplit_rows

        # manual salting: replicate the dim across _N_SALTS salt values,
        # scatter the fact's hot key uniformly — same result by
        # construction, and the pattern to compare AQE against
        salted_fact = fact.withColumn(
            "salt", (F.xxhash64("v", "pad") % _N_SALTS + _N_SALTS) % _N_SALTS
        )
        salted_dim = dim.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(_N_SALTS - 1)))
        )
        j = salted_fact.join(salted_dim, ["k", "salt"]).select(
            "k", (F.col("v") + F.col("w")).alias("s")
        )
        salted = j.groupBy((F.col("k") % 16).alias("g")).agg(
            F.count("*").alias("n"), F.sum("s").alias("sum_s")
        )
        assert _rows(salted, ["g", "n", "sum_s"]) == split_rows
    finally:
        _restore_confs(spark, saved)

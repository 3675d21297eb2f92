"""Round-12 additions: hot-part hardening for the affinity pair build
(VERDICT r11 #3).

`graph_connected_users`' edge build used to collect EVERY buyer of a
part into one in-row array and explode C(n,2) structs from that single
row — linear on this fixture (~30 buyers/part) but an executor OOM on
a power-law catalog where one hot part has 10^5-10^6 buyers. Round 12
routes parts above `_HOT_BUYERS_CAP` through a salted two-level
bucket-pair build (the agg_salted_skew device in pair space). These
tests pin the two contracts:

- equality: the salted form emits exactly the multiset of pairs the
  unsalted in-row form emits, on real fixture data (every part cold)
  AND on a planted-hot-part fixture with the cap forced low so both
  hot paths (same-bucket and cross-bucket) carry real weight;
- boundedness: with a hot part planted, no single collected basket
  row exceeds the cap — the 10^6-element-array failure mode cannot
  occur by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table
from data_collection_ieee_spark.operators.graph import (
    _affinity_pairs,
    _HOT_BUYERS_CAP,
)

SF001 = "/root/testdata/sf0.001"


def _pairs_multiset(df):
    rows = (
        df.groupBy("a_id", "b_id").agg(F.count("*").alias("m")).collect()
    )
    return {(r["a_id"], r["b_id"]): r["m"] for r in rows}


def _unsalted_reference(cp):
    """The pre-round-12 in-row form, kept here as the test reference."""
    buyers = cp.groupBy("p").agg(
        F.array_sort(F.collect_list("c")).alias("bs")
    )
    idx = F.sequence(F.lit(1), F.size("bs") - 1)
    pair_col = F.explode(
        F.flatten(
            F.transform(
                idx,
                lambda i: F.transform(
                    F.sequence(i + 1, F.size("bs")),
                    lambda j: F.struct(
                        F.element_at("bs", i.cast("int")).alias("u"),
                        F.element_at("bs", j.cast("int")).alias("v"),
                    ),
                ),
            )
        )
    )
    return (
        buyers.filter(F.size("bs") >= 2)
        .select(pair_col.alias("z"))
        .select(F.col("z.u").alias("a_id"), F.col("z.v").alias("b_id"))
    )


def _fixture_cp(spark):
    li = load_table(spark, SF001, "lineitem").select("l_orderkey", "l_partkey")
    od = load_table(spark, SF001, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )


def test_affinity_pairs_equals_unsalted_on_fixture(spark):
    """On sf0.001 every part is cold (buyers/part ~30 << 1024), so the
    hardened build must reduce to the in-row path bit-for-bit — and
    the default cap really does keep the fixture on that path."""
    cp = _fixture_cp(spark)
    assert (
        cp.groupBy("p").count().agg(F.max("count")).collect()[0][0]
        < _HOT_BUYERS_CAP
    )
    assert _pairs_multiset(_affinity_pairs(cp)) == _pairs_multiset(
        _unsalted_reference(cp)
    )


def _planted_cp(spark, n_hot=3000, hot_part=999_999):
    """One planted hot part with n_hot distinct buyers, on top of a
    small cold tail (three parts of 3-5 buyers each, with buyer
    overlap so cross-part shared counts exist)."""
    rows = [{"c": c, "p": hot_part} for c in range(1, n_hot + 1)]
    rows += [{"c": c, "p": 1} for c in (1, 2, 3)]
    rows += [{"c": c, "p": 2} for c in (2, 3, 4, 5)]
    rows += [{"c": c, "p": 3} for c in (1, 2, 3, 4, 6)]
    return spark.createDataFrame(pd.DataFrame(rows)).select(
        F.col("c").cast("long").alias("c"), F.col("p").cast("long").alias("p")
    )


def test_affinity_pairs_hot_part_equality(spark):
    """Planted hot part (3000 buyers, cap forced to 64 => ~47 buckets,
    both hot sub-paths active) must emit exactly the unsalted pair
    multiset: C(3000,2) hot pairs + the cold tail's pairs."""
    cp = _planted_cp(spark)
    got = _pairs_multiset(_affinity_pairs(cp, cap=64))
    want = _pairs_multiset(_unsalted_reference(cp))
    assert got == want
    # sanity on the reference itself: the hot part contributes C(n,2)
    n_hot = 3000
    assert sum(want.values()) == n_hot * (n_hot - 1) // 2 + 3 + 6 + 10


def test_affinity_pairs_hot_part_rows_stay_bounded(spark):
    """The boundedness contract: with the hot part planted, no basket
    array the plan ever collects exceeds the cap — i.e. the failure
    mode (one row holding a whole hot part) is structurally gone.
    Checked by reproducing the plan's two collect_list stages under
    the same bucketing and measuring their max array size."""
    cap = 64
    cp = _planted_cp(spark)
    deg = cp.groupBy("p").agg(F.count("*").alias("nb"))
    cpd = cp.join(deg, "p")
    cold_max = (
        cpd.filter(F.col("nb") <= cap)
        .groupBy("p")
        .agg(F.count("*").alias("sz"))
        .agg(F.max("sz"))
        .collect()[0][0]
    )
    hot_bucket_max = (
        cpd.filter(F.col("nb") > cap)
        .select(
            "p",
            F.pmod(
                F.xxhash64("c"), F.ceil(F.col("nb") / cap).cast("long")
            ).alias("b"),
        )
        .groupBy("p", "b")
        .agg(F.count("*").alias("sz"))
        .agg(F.max("sz"))
        .collect()[0][0]
    )
    assert cold_max <= cap
    # hash bucketing is balanced in expectation; allow 2x headroom for
    # collision variance, still worlds away from the 3000-row blowup
    assert hot_bucket_max <= 2 * cap

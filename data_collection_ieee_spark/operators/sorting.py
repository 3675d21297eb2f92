"""Sorts, limits, top-k, set operations (SURVEY.md §2B).

The driver's value hash is order-insensitive, so ORDER BY semantics are
encoded as an explicit row_number column (computed over the same total
order on both engines — sort keys always end in a unique tiebreaker).

Scale notes: global top-k compiles to TakeOrderedAndProject (per-
partition heap + driver merge of k rows — no global sort); the global
row_number in `sort_multi` is computed with the distributed
range-partition + per-partition-offset pattern (see its docstring) —
no single-partition window anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table, persist_tracked
from data_collection_ieee_spark.registry import query


@query(
    "sort_multi",
    oracle="""
SELECT o_orderkey,
       NULLIF(o_orderstatus, 'P') AS status_or_null,
       o_totalprice,
       CAST(ROW_NUMBER() OVER (ORDER BY NULLIF(o_orderstatus, 'P') ASC NULLS LAST,
                          o_totalprice DESC, o_orderkey ASC) AS INT) AS pos
FROM orders
""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with NULLS LAST, made hash-checkable by encoding
    the total order into `pos` (keys end in the unique o_orderkey).

    The global row_number is computed WITHOUT a single-partition window
    (the scale-killer `Window.orderBy` with no partitionBy — flagged and
    removed in round 5; tools/plan_audit.py now rejects the pattern):

    1. `repartitionByRange` on the sort keys — Spark's distributed sort
       shuffle: partition p holds a key range strictly before p+1 —
       then `sortWithinPartitions` (in-partition sort, NO extra
       shuffle) and `monotonically_increasing_id`, which encodes
       (partition_id << 33) + in-partition index in arrival order,
       i.e. sorted order. The id expression is nondeterministic, so
       Catalyst cannot reorder it below the sort.
    2. Per-partition row counts (one tiny aggregate over the cached
       frame; ≤ n_partitions rows collected — bounded metadata).
    3. `pos` = cumulative offset of the partition + in-partition index
       + 1, attached via a broadcast join on partition id — zero
       additional shuffle of the data.

    Determinism: `pos` depends only on the TOTAL ORDER (keys end in the
    unique o_orderkey), never on where the range boundaries fall. The
    stamped frame is persisted so the count job and the result job see
    the SAME partitioning and ids (and a recompute re-seeds
    RangePartitioner from the same RDD id — the r4 ntile lesson: never
    let two separate jobs cut boundaries independently and assume they
    agree)."""
    od = load_table(spark, sf_dir, "orders").withColumn(
        "status_or_null", F.nullif(F.col("o_orderstatus"), F.lit("P"))
    )
    keys = [
        F.col("status_or_null").asc_nulls_last(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    ]
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    stamped = persist_tracked(
        od.select("o_orderkey", "status_or_null", "o_totalprice")
        .repartitionByRange(n_parts, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    pid = F.shiftrightunsigned("_mid", 33).cast("int")
    counts = stamped.groupBy(pid.alias("_pid")).agg(F.count("*").alias("c")).collect()
    offsets, acc = [], 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        acc += r["c"]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    in_idx = F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
    return (
        stamped.withColumn("_pid", pid)
        .join(F.broadcast(off_df), "_pid")
        .withColumn("pos", (F.col("_off") + in_idx + 1).cast("int"))
        .select("o_orderkey", "status_or_null", "o_totalprice", "pos")
    )


@query(
    "topk_limit",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy().limit() → TakeOrderedAndProject (each
    partition keeps a k-heap; only k rows reach the driver-side merge,
    regardless of input size)."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "set_intersect",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    seg = cu.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    active = od.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return seg.intersect(active)


@query(
    "set_except",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT ALL
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus IN ('O', 'F')
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    left = cu.select("c_custkey")
    right = od.filter(F.col("o_orderstatus").isin("O", "F")).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return left.exceptAll(right)


@query(
    "distinct_rows",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus, CAST(year(l_shipdate) AS INT) AS ship_year
FROM lineitem
""",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a projection (north-star dedup level 1) — a
    hash aggregate on the projected key, map-side combined."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        F.year("l_shipdate").alias("ship_year"),
    ).distinct()


@query(
    "set_union",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
UNION
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
""",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct set union (UNION vs the engine's append-style UNION ALL
    elsewhere): union then one hash-distinct shuffle."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    seg = cu.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    pend = od.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return seg.union(pend).distinct()

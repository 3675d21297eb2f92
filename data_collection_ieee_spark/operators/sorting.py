"""Sorts, limits, top-k, set operations (SURVEY.md §2B).

The driver's value hash is order-insensitive, so ORDER BY semantics are
encoded as an explicit row_number column (computed over the same total
order on both engines — sort keys always end in a unique tiebreaker).

Scale notes: global top-k compiles to TakeOrderedAndProject (per-
partition heap + driver merge of k rows — no global sort); the encoded
global row_number in `sort_multi` is the one inherently serial shape
here and exists only to make ordering hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table
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
    the total order into `pos` (keys end in the unique o_orderkey)."""
    od = load_table(spark, sf_dir, "orders").withColumn(
        "status_or_null", F.nullif(F.col("o_orderstatus"), F.lit("P"))
    )
    w = Window.orderBy(
        F.col("status_or_null").asc_nulls_last(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )
    return od.select(
        "o_orderkey", "status_or_null", "o_totalprice"
    ).withColumn("pos", F.row_number().over(w))


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

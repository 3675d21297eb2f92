"""Projection / filter / predicate operators (SURVEY.md §2B).

Direct descendants of the reference's per-field extraction semantics:
- ``_safe_get_text`` returning ``""`` on miss (reference main.py:165-171)
  → the ""-as-null sentinel normalization (`filter_null_sentinel`);
- the `a or b or c` selector fallback chains (reference mainn.py:73-82)
  → `coalesce_fallback`;
- the constant `indexation` tag column (main.py:96) → `project_rename`;
- the stubbed quartile enrichment (main.py:182-185) → `case_when_enrich`
  made real as a CASE-WHEN banding.

All single-pass narrow transformations: no shuffle at any scale, and the
predicates/projections push down into the parquet scan (PushedFilters /
ReadSchema in .explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table
from data_collection_ieee_spark.registry import query


@query(
    "project_rename",
    oracle="""
SELECT p_partkey AS part_id,
       lower(p_name) AS part_name,
       'CATALOG' AS indexation,
       p_retailprice AS price
FROM part
""",
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = load_table(spark, sf_dir, "part")
    return pt.select(
        F.col("p_partkey").alias("part_id"),
        F.lower("p_name").alias("part_name"),
        F.lit("CATALOG").alias("indexation"),
        F.col("p_retailprice").alias("price"),
    )


@query(
    "filter_pred",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE l_quantity > 30
  AND l_discount BETWEEN 0.02 AND 0.08
  AND (l_returnflag = 'R' OR l_linestatus = 'F')
""",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & F.col("l_discount").between(0.02, 0.08)
        & ((F.col("l_returnflag") == "R") | (F.col("l_linestatus") == "F"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "filter_null_sentinel",
    oracle="""
WITH bronze AS (
  SELECT p_partkey,
         CASE WHEN p_size < 10 THEN '' ELSE p_type END AS raw_type
  FROM part
)
SELECT p_partkey, NULLIF(raw_type, '') AS p_type
FROM bronze
WHERE NULLIF(raw_type, '') IS NOT NULL
""",
)
def filter_null_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's null model (empty string on extraction miss,
    main.py:171) normalized to real SQL NULL, then filtered — the
    bronze→silver rule applied as an operator."""
    pt = load_table(spark, sf_dir, "part")
    bronze = pt.select(
        "p_partkey",
        F.when(F.col("p_size") < 10, F.lit("")).otherwise(F.col("p_type")).alias("raw_type"),
    )
    silver = bronze.select(
        "p_partkey", F.nullif(F.col("raw_type"), F.lit("")).alias("p_type")
    )
    return silver.filter(F.col("p_type").isNotNull())


@query(
    "coalesce_fallback",
    oracle="""
WITH bronze AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN '' ELSE c_name END AS sel_a,
         CASE WHEN c_custkey % 3 = 1 THEN '' ELSE upper(c_name) END AS sel_b,
         c_mktsegment AS sel_c
  FROM customer
)
SELECT c_custkey,
       COALESCE(NULLIF(sel_a, ''), NULLIF(sel_b, ''), NULLIF(sel_c, '')) AS resolved
FROM bronze
""",
)
def coalesce_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: the reference's 2-3-way selector fallback (`a or b or c`,
    mainn.py:73-82) as COALESCE over ""-normalized candidates."""
    cu = load_table(spark, sf_dir, "customer")
    bronze = cu.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, F.lit("")).otherwise(F.col("c_name")).alias("sel_a"),
        F.when(F.col("c_custkey") % 3 == 1, F.lit(""))
        .otherwise(F.upper("c_name"))
        .alias("sel_b"),
        F.col("c_mktsegment").alias("sel_c"),
    )
    empty = F.lit("")
    return bronze.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("sel_a"), empty),
            F.nullif(F.col("sel_b"), empty),
            F.nullif(F.col("sel_c"), empty),
        ).alias("resolved"),
    )


@query(
    "case_when_enrich",
    oracle="""
SELECT o_orderkey,
       o_totalprice,
       CASE
         WHEN o_totalprice >= 300000 THEN 'Q1'
         WHEN o_totalprice >= 150000 THEN 'Q2'
         WHEN o_totalprice >= 50000 THEN 'Q3'
         ELSE 'Q4'
       END AS price_band
FROM orders
""",
)
def case_when_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 made real: the reference's always-empty `quartile` enrichment
    stub (main.py:182-185) as an actual conditional banding."""
    od = load_table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_totalprice") >= 300000, "Q1")
        .when(F.col("o_totalprice") >= 150000, "Q2")
        .when(F.col("o_totalprice") >= 50000, "Q3")
        .otherwise("Q4")
        .alias("price_band"),
    )

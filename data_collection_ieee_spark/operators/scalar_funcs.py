"""Scalar function surface: string / regex / date / math / array / JSON
(SURVEY.md §2B "Scalar functions").

Reference lineage: trim (reference main.py:169), substring-truncate
(main.py:110), URL/DOI string wrangling (the two DOI encodings in the
shipped data: `"DOI: 10.1109/…"` IEEE vs `"https://doi.org/10.1145/…"`
ACM), the `"; "`-joined author lists (main.py:101), and the JSON props
column of the events table.

All JVM-side built-ins inside whole-stage codegen — zero Python in the
hot path, so these cost the same as the enclosing scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table
from data_collection_ieee_spark.registry import query


@query(
    "str_funcs",
    oracle="""
SELECT p_partkey,
       lower(trim(p_name)) AS name_lc,
       substring(p_name, 1, 12) AS name_prefix,
       CAST(length(p_name) AS INT) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_snake
FROM part
""",
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = load_table(spark, sf_dir, "part")
    return pt.select(
        "p_partkey",
        F.lower(F.trim(F.col("p_name"))).alias("name_lc"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@query(
    "str_regex_normalize",
    oracle="""
WITH bronze AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN 'DOI: 10.1109/X.' || CAST(doc_id AS VARCHAR)
              ELSE 'https://doi.org/10.1145/' || CAST(doc_id AS VARCHAR)
         END AS raw_doi
  FROM documents
)
SELECT doc_id, raw_doi,
       regexp_extract(raw_doi, '10\\.\\d{4,9}/\\S+') AS doi
FROM bronze
""",
)
def str_regex_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's two DOI encodings (IEEE 'DOI: 10.…' prefix form,
    ACM 'https://doi.org/10.…' URL form) normalized to one canonical
    key with a single regexp — the prerequisite for cross-source dedup.
    """
    docs = load_table(spark, sf_dir, "documents")
    raw = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("DOI: 10.1109/X."), F.col("doc_id").cast("string")),
    ).otherwise(F.concat(F.lit("https://doi.org/10.1145/"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", raw.alias("raw_doi"))
        .withColumn("doi", F.regexp_extract("raw_doi", r"10\.\d{4,9}/\S+", 0))
    )


@query(
    "str_split_explode",
    oracle="""
SELECT doc_id, t.token
FROM documents, unnest(string_split(text, ' ')) AS t(token)
""",
)
def str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The '; '-joined author-list semantics (reference main.py:101)
    generalized: split + explode string → rows. Narrow transform, no
    shuffle; output cardinality = token count."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )


@query(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to_cutoff,
       CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date
FROM orders
""",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_cutoff"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 90).alias("due_date"),
    )


@query(
    "math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS price_r1,
       abs(l_discount - 0.05) AS disc_dev,
       floor(l_quantity) AS qty_floor,
       ceil(l_extendedprice / 1000) AS price_kilo,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
       CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
FROM lineitem
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_kilo"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.round(revenue, 2).cast("double").alias("revenue"),
    )


@query(
    "array_funcs",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
SELECT doc_id,
       CAST(len(tokens) AS INT) AS n_tokens,
       CAST(len(list_distinct(tokens)) AS INT) AS n_distinct,
       list_contains(tokens, 'spark') AS has_spark,
       list_sort(tokens)[1] AS first_token,
       array_to_string(list_sort(list_distinct(tokens)), ' ') AS sorted_vocab
FROM toks
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("tokens"))
    return toks.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct"),
        F.array_contains("tokens", "spark").alias("has_spark"),
        F.array_sort("tokens").getItem(0).alias("first_token"),
        F.array_join(F.array_sort(F.array_distinct("tokens")), " ").alias("sorted_vocab"),
    )


@query(
    "map_json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
""",
)
def map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-string column access (events.props = '{"k": 87}'): parse →
    extract → derive, all with codegen'd JSON path expressions."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )

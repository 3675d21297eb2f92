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
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_kilo,
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


@query(
    "explode_outer_fill",
    oracle="""
WITH l AS (
  SELECT p_partkey,
         list_filter(string_split(p_name, ' '), t -> length(t) > 5) AS toks
  FROM part
)
SELECT p_partkey,
       unnest(CASE WHEN len(toks) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE toks END) AS token
FROM l
""",
)
def explode_outer_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: rows whose filtered token array is
    empty survive with a NULL token (count-preserving lateral view) —
    the outer-unnest contract the reference's per-record extraction
    loop needs when a selector matches nothing (reference
    main.py:117-123 drops such rows; the engine keeps them typed)."""
    p = load_table(spark, sf_dir, "part")
    toks = F.filter(F.split("p_name", " "), lambda t: F.length(t) > 5)
    return p.select("p_partkey", F.explode_outer(toks).alias("token"))


@query(
    "str_edit_distance",
    oracle="""
SELECT p_partkey,
       CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev,
       CAST(length(p_name) AS INT) AS len_name
FROM part
""",
)
def str_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distance between two string columns (fuzzy-match
    primitive for the engine's record-linkage surface; both engines
    implement the same exact DP distance). Narrow, codegen'd, no
    shuffle."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").cast("long").alias("lev"),
        F.length("p_name").cast("int").alias("len_name"),
    )


@query(
    "date_series_fill",
    oracle="""
WITH e AS (
  SELECT event_type, CAST(ts AS DATE) AS d FROM events
),
b AS (
  SELECT event_type, MIN(d) AS lo, MAX(d) AS hi FROM e GROUP BY event_type
),
days AS (
  SELECT event_type,
         CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS d
  FROM b
),
c AS (
  SELECT event_type, d, COUNT(*) AS n FROM e GROUP BY event_type, d
)
SELECT days.event_type, days.d, COALESCE(c.n, 0) AS n
FROM days LEFT JOIN c ON days.event_type = c.event_type AND days.d = c.d
""",
)
def date_series_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free daily event counts: per-type min/max date bounds →
    sequence() date spine → left join observed counts → zero-fill.
    The dense-calendar trick every time-series rollup needs (a missing
    day must report 0, not vanish). The spine is generated from the
    tiny bounds frame, never by scanning the fact table twice at full
    width."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d")
    )
    bounds = ev.groupBy("event_type").agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    days = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("d")
    )
    counts = ev.groupBy("event_type", "d").agg(F.count("*").alias("n"))
    return days.join(counts, ["event_type", "d"], "left").select(
        "event_type", "d", F.coalesce("n", F.lit(0)).alias("n")
    )


@query(
    "map_transform_funcs",
    oracle="""
WITH m AS (
  SELECT event_id, event_type,
         MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)} AS meta
  FROM events
)
SELECT event_id, event_type,
       CAST(map_extract(meta, 'uid')[1] AS BIGINT) AS uid_back,
       CAST(cardinality(meta) AS INT) AS n_keys,
       list_sort(map_keys(meta)) AS keys_sorted
FROM m
""",
)
def map_transform_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction and access: build a map column from scalar
    fields, read it back by key, count and list its keys — the typed-
    metadata pattern multimodal columns carry beside their payloads.
    All JVM map expressions; keys_sorted makes the only set-valued
    output deterministic."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        "event_type",
        F.element_at(m, "uid").cast("long").alias("uid_back"),
        F.size(m).alias("n_keys"),
        F.array_sort(F.map_keys(m)).alias("keys_sorted"),
    )


@query(
    "date_arith_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
       CAST(date_part('dow', o_orderdate) + 1 AS INT) AS dow,
       CAST(date_part('doy', o_orderdate) AS INT) AS doy
FROM orders
""",
)
def date_arith_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic beyond date_funcs' basics: month-preserving
    add, month-end snap, quarter truncation, day-of-week/year — the
    fiscal-calendar toolkit, all codegen'd."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.add_months(d, 3).alias("plus_3m"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
    )


@query(
    "array_zip_funcs",
    oracle="""
WITH v AS (
  SELECT vec_id,
         [round(CAST(x AS DOUBLE), 4) + 0.0 for x in embedding[1:4]] AS head4,
         [round(CAST(x AS DOUBLE), 4) + 0.0 for x in embedding[61:64]] AS tail4
  FROM embeddings
)
SELECT vec_id,
       [round(head4[i] + tail4[i], 4) + 0.0 for i in range(1, 5)] AS zipped_sum,
       flatten([head4, tail4]) AS merged,
       list_reverse(head4) AS head_rev
FROM v
""",
)
def array_zip_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array combinators over vector slices: element-wise zip_with sum,
    flatten of an array-of-arrays, and reverse — the building blocks
    the engine's vector expressions (dot products, signatures) are made
    of, exposed as their own checked surface. All in-row, no shuffle;
    floats are rounded per element on both engines before comparison
    (with `+ 0.0` to collapse signed zero: Spark's round drops the sign
    of -0.0, DuckDB's keeps it)."""
    emb = load_table(spark, sf_dir, "embeddings")
    r4 = lambda c: F.round(c.cast("double"), 4) + F.lit(0.0)  # noqa: E731
    head4 = F.transform(F.slice("embedding", 1, 4), r4)
    tail4 = F.transform(F.slice("embedding", 61, 4), r4)
    v = emb.select("vec_id", head4.alias("head4"), tail4.alias("tail4"))
    return v.select(
        "vec_id",
        F.transform(
            F.zip_with("head4", "tail4", lambda x, y: x + y),
            lambda s: F.round(s, 4) + F.lit(0.0),
        ).alias("zipped_sum"),
        F.flatten(F.array("head4", "tail4")).alias("merged"),
        F.reverse("head4").alias("head_rev"),
    )

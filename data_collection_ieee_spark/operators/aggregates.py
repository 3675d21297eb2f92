"""Aggregation operators (SURVEY.md §2B "Aggregations").

All pure DataFrame API: Catalyst plans these as partial (map-side) +
final hash aggregates with whole-stage codegen, which is exactly the
100 TB-scale shape — one shuffle on the grouping key, combine before it.
Money sums use exact decimal arithmetic (see functions/exact.py) so the
DuckDB oracle hash matches bit-for-bit.

Reference lineage: the reference has NO aggregation (its analytics stop
at record extraction — see reference main.py:187-199 where the only
"processing" is list→DataFrame→CSV). This module supplies the
bibliometric-style aggregation surface its schema implies
(publications per venue/author/year ⇒ groupBy + count/sum here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table
from data_collection_ieee_spark.functions.exact import (
    RATE,
    davg,
    dec,
    dsum,
    sql_davg,
    sql_dsum,
)
from data_collection_ieee_spark.registry import query

# TPC-H Q1-style pricing summary: the flagship query (SURVEY.md §7 M0).
# Scan → filter (pushed to parquet) → partial agg → shuffle on the
# 2-value grouping key → final agg. At 100 TB the map-side combine
# reduces the shuffle to |groups| × |partitions| rows — negligible.
_Q1_CUTOFF = "1998-09-02 00:00:00"


@query(
    "agg_hash_group",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))', 'DECIMAL(20,4)')} AS sum_disc_price,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount', 'DECIMAL(4,2)')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_hash_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (
        F.lit(1).cast(RATE) - dec("l_discount", RATE)
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(20,4)")).cast("double").alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", RATE).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


# Approximate HLL distinct: intentionally NO oracle entry — the driver
# applies its rows-only check. The exactness contract is covered by the
# tolerance test in tests/test_aggregates.py (within 5% of exact).
@query("agg_approx_distinct")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )


@query(
    "agg_rollup",
    oracle=f"""
SELECT event_type,
       CAST(ts AS DATE) AS day,
       COUNT(*) AS n,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return ev.rollup("event_type", "day").agg(
        F.count("*").alias("n"),
        dsum("value").alias("total_value"),
    )


@query(
    "agg_cube",
    oracle=f"""
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n,
       {sql_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return od.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum("o_totalprice").alias("total_price"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n,
       {sql_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    od.createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus,
               o_orderpriority,
               COUNT(*) AS n,
               {sql_dsum('o_totalprice')} AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_having",
    oracle=f"""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return (
        od.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("spend"))
        .filter(F.col("n_orders") >= 12)
    )


# collect_set analogue of the reference's per-journal author lists
# (chercheurs "; "-joined strings, reference main.py:101): per region,
# the sorted distinct nation names as one deterministic string.
@query(
    "agg_collect",
    oracle="""
SELECT n_regionkey,
       array_to_string(list_sort(list(DISTINCT n_name)), '; ') AS nations,
       COUNT(*) AS n
FROM nation
GROUP BY n_regionkey
""",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    na = load_table(spark, sf_dir, "nation")
    return na.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_set("n_name")), "; ").alias("nations"),
        F.count("*").alias("n"),
    )


_PIVOT_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIVOT_SQL_CELLS = ",\n       ".join(
    f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)"
    f" AS prio_{i + 1}"
    for i, p in enumerate(_PIVOT_PRIORITIES)
)


@query(
    "agg_pivot",
    oracle=f"""
SELECT o_orderstatus,
       {_PIVOT_SQL_CELLS}
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab) total price by order priority per status. The
    pivot VALUES are pinned explicitly — no discovery pass over the
    data, so the plan is a single hash aggregate producing one
    conditional decimal sum per cell (exactly the CASE-WHEN form of
    the oracle), and the output schema is static at any scale."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PIVOT_PRIORITIES)
        .agg(dsum("o_totalprice"))
    )
    return piv.select(
        "o_orderstatus",
        *[F.col(f"`{p}`").alias(f"prio_{i + 1}") for i, p in enumerate(_PIVOT_PRIORITIES)],
    )


@query(
    "agg_mode_exact",
    oracle="""
WITH c AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_returnflag, l_quantity
),
r AS (
  SELECT l_returnflag, l_quantity, cnt,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, l_quantity ASC) AS rn
  FROM c
)
SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_n
FROM r WHERE rn = 1
""",
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode with a deterministic smallest-value
    tie-break (count desc, value asc). Two hash aggregates + a window
    over the tiny (group × distinct-value) frame — never a sort of the
    raw fact table."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("cnt").alias("mode_n"),
        )
    )


@query(
    "stats_corr",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(30,4))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
FROM s
""",
)
def stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group WITHOUT corr()'s float-accumulation
    nondeterminism: the five moments are exact decimal sums (order-
    independent), and the closed-form correlation is one fixed double
    expression over them — bit-identical on any partitioning, any
    engine. Still one map-side-combined aggregate at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    big = "decimal(30,4)"
    # hoist the double→decimal casts into ONE projection so each row
    # pays two casts, not six: the five moment aggregates then reference
    # the bound attributes instead of re-evaluating dec() per expression
    proj = li.select(
        "l_returnflag",
        dec("l_quantity").alias("xd"),
        dec("l_extendedprice").alias("yd"),
    )
    x, y = F.col("xd"), F.col("yd")
    s = proj.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * y).cast(big)).cast("double").alias("sxy"),
        F.sum((x * x).cast(big)).cast("double").alias("sxx"),
        F.sum((y * y).cast(big)).cast("double").alias("syy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


_N_SALTS = 16


@query(
    "agg_salted_skew",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY event_type
""",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via two-stage salting: stage 1 aggregates on
    (event_type, salt) — the salt (a deterministic hash of the row key,
    mod 16) splits each hot group across 16 reducers — stage 2 combines
    the 16 partials per group. Results are identical to the direct
    GROUP BY (counts and decimal sums are associative); what changes at
    100 TB is the shuffle profile: no single reducer ever receives a
    whole hot key's rows. AQE's skew handling makes this unnecessary
    for JOINS, but for aggregations with giant groups pre-salting is
    still the reliable fix."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(_N_SALTS)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(dec("value")).alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("pv").cast("double").alias("total_value"),
    )


@query("agg_approx_quantiles")
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna sketch, accuracy 10000)
    of order totals per status — the mergeable-sketch shape that scales:
    partial sketches combine across partitions without ever sorting the
    column. No SQL oracle (sketch internals differ per engine); the
    tolerance contract vs exact percentiles is asserted in
    tests/test_llm_ops.py."""
    o = load_table(spark, sf_dir, "orders")
    q = F.percentile_approx("o_totalprice", [0.25, 0.5, 0.75, 0.95], 10000)
    return (
        o.groupBy("o_orderstatus")
        .agg(q.alias("qs"))
        .select(
            "o_orderstatus",
            F.col("qs")[0].alias("p25"),
            F.col("qs")[1].alias("p50"),
            F.col("qs")[2].alias("p75"),
            F.col("qs")[3].alias("p95"),
        )
    )


@query(
    "agg_bool_countif",
    oracle="""
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       bool_and(l_quantity > 0) AS all_positive_qty,
       bool_or(l_discount >= 0.10) AS any_deep_discount,
       CAST(SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tax_free
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_bool_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregates: count_if, every (bool_and), any
    (bool_or), and a CASE-sum — all map-side combinable, all exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.every(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.some(F.col("l_discount") >= 0.10).alias("any_deep_discount"),
        F.sum(F.when(F.col("l_tax") == 0, 1).otherwise(0)).alias("n_tax_free"),
    )


@query(
    "agg_unpivot",
    oracle="""
WITH wide AS (
  SELECT doc_id,
         CAST(n_chars AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
  FROM documents
)
SELECT doc_id, metric, value
FROM wide UNPIVOT (value FOR metric IN (n_chars, n_tokens, n_uniq))
""",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the wide→long inverse of `agg_pivot`, used to
    turn per-document feature columns into a (doc_id, metric, value)
    observation table for feature stores and plotting layers. The
    metric list is pinned, so this is a pure in-row expand (each input
    row emits exactly 3 output rows, no shuffle) and the output schema
    is static regardless of how many documents flow through."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    wide = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq"),
    )
    return wide.unpivot(["doc_id"], ["n_chars", "n_tokens", "n_uniq"], "metric", "value")


@query(
    "agg_median_exact",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 4) AS med_qty,
       round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.9), 4) AS p90_qty,
       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4) AS med_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90) per group — the
    precise counterpart of `agg_approx_quantiles`. Spark's `percentile`
    is a sort-based exact aggregate; at 100 TB the approx sketch is the
    default path and this is the audited spot-check, so both live in
    the surface. Interpolation (percentile_cont semantics) is the same
    linear formula on both engines; outputs rounded to 4 places."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    price = F.col("l_extendedprice").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(qty, F.lit(0.5)), 4).alias("med_qty"),
        F.round(F.percentile(qty, F.lit(0.9)), 4).alias("p90_qty"),
        F.round(F.percentile(price, F.lit(0.5)), 4).alias("med_price"),
    )


@query("agg_sketch_reaggregate")
def agg_sketch_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level HLL sketch re-aggregation — the 100 TB distinct-count
    pattern: each shard builds a Datasketches HLL of its users
    (hll_sketch_agg, map-side, constant memory), then the per-type
    rollup merges the binary sketches (hll_union_agg) and estimates.
    At scale level 1 runs where the data lives and only kilobyte
    sketches cross the wire; the merge is associative so the same
    sketches also roll up to coarser grains without rescanning. No SQL
    oracle (sketch binaries are engine-specific); the tolerance vs the
    exact distinct count is asserted in tests/test_llm_ops.py."""
    ev = load_table(spark, sf_dir, "events")
    shard = (F.col("user_id") % 8).alias("shard")
    partials = ev.groupBy("event_type", shard).agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    return (
        partials.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("int").alias("approx_users"))
    )


@query(
    "agg_listagg",
    oracle="""
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       CAST(count(*) AS INT) AS n
FROM nation
GROUP BY n_regionkey
""",
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): collect_list
    gives no ordering guarantee under parallel merge, so the engine's
    deterministic form is collect → array_sort → array_join — the sort
    happens per group after the shuffle, making the concatenation
    reproducible on any partitioning. Bounded-size groups only (here
    the 25-nation dimension); unbounded groups should aggregate, not
    concatenate."""
    na = load_table(spark, sf_dir, "nation")
    return na.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count("*").cast("int").alias("n"),
    )


@query(
    "stats_ks_source",
    oracle="""
WITH lens AS (SELECT source, n_chars AS x FROM documents),
ns AS (SELECT source, COUNT(*) AS n FROM lens GROUP BY source),
hist AS (SELECT source, x, COUNT(*) AS cnt FROM lens GROUP BY source, x),
xs AS (SELECT DISTINCT x FROM lens),
grid AS (SELECT ns.source, ns.n, xs.x FROM ns CROSS JOIN xs),
cum AS (
  SELECT grid.source, grid.n, grid.x,
         SUM(COALESCE(hist.cnt, 0)) OVER (PARTITION BY grid.source ORDER BY grid.x
                                          ROWS UNBOUNDED PRECEDING) AS c
  FROM grid LEFT JOIN hist ON grid.source = hist.source AND grid.x = hist.x
),
num AS (
  SELECT a.source AS source_a, b.source AS source_b, a.n AS n_a, b.n AS n_b, a.x,
         abs(a.c * b.n - b.c * a.n) AS num
  FROM cum a JOIN cum b ON a.x = b.x AND a.source < b.source
),
w AS (
  SELECT *, MAX(num) OVER (PARTITION BY source_a, source_b) AS mx FROM num
)
SELECT source_a, source_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(CAST(mx AS DOUBLE) / (n_a * n_b), 6) AS ks_stat,
       CAST(MIN(CASE WHEN num = mx THEN x END) AS BIGINT) AS ks_at_value
FROM w GROUP BY source_a, source_b, n_a, n_b, mx
""",
)
def stats_ks_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between every pair of
    sources over the document-length distribution — the drift test a
    curation pipeline runs when a new crawl lands ("does src3's length
    profile match src1's?"). D = max_x |F_a(x) − F_b(x)| evaluated on
    the exact value grid; the comparison is integer cross-multiplied
    (|c_a·n_b − c_b·n_a| over the common denominator n_a·n_b), so the
    max and its argmax (smallest attaining x, a total order) are exact —
    the only float op is the final reported division. The cross-product
    fits int64 up to ~3·10⁹ docs per source pair; beyond that, lift to
    DECIMAL(38,0) or evaluate on a t-digest grid.

    Plan: per-source histograms (map-side combined) → cumulative counts
    via per-source ordered windows over the value GRID (sources ×
    distinct values — cardinality is distinct-value-bounded, not
    row-bounded) → pair join on x → windowed max + argmax. At 100 TB
    the grid stays small for integer-ish features; for continuous ones
    the same plan runs over sketch quantile boundaries."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("x")
    )
    ns = docs.groupBy("source").agg(F.count("*").alias("n"))
    hist = docs.groupBy("source", "x").agg(F.count("*").alias("cnt"))
    xs = docs.select("x").distinct()
    grid = ns.crossJoin(xs)
    wc = (
        Window.partitionBy("source")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        grid.join(hist, ["source", "x"], "left")
        .withColumn("c", F.sum(F.coalesce("cnt", F.lit(0))).over(wc))
        .select("source", "n", "x", "c")
    )
    a = cum.select(
        F.col("source").alias("source_a"),
        F.col("n").alias("n_a"),
        "x",
        F.col("c").alias("c_a"),
    )
    b = cum.select(
        F.col("source").alias("source_b"),
        F.col("n").alias("n_b"),
        "x",
        F.col("c").alias("c_b"),
    )
    num = (
        a.join(b, "x")
        .filter(F.col("source_a") < F.col("source_b"))
        .withColumn("num", F.abs(F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a")))
    )
    wm = Window.partitionBy("source_a", "source_b")
    w = num.withColumn("mx", F.max("num").over(wm))
    return w.groupBy("source_a", "source_b", "n_a", "n_b", "mx").agg(
        F.min(F.when(F.col("num") == F.col("mx"), F.col("x"))).cast("long").alias(
            "ks_at_value"
        )
    ).select(
        "source_a",
        "source_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.col("mx").cast("double") / (F.col("n_a") * F.col("n_b")), 6).alias(
            "ks_stat"
        ),
        "ks_at_value",
    )


@query(
    "stats_gini_tokens",
    oracle="""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS x
  FROM documents
),
r AS (
  SELECT source, x,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id) AS i
  FROM t
),
g AS (
  SELECT source, COUNT(*) AS n, SUM(x) AS tot, SUM(i * x) AS s1
  FROM r GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       CAST(tot AS BIGINT) AS sum_tokens,
       round(CAST(2 * s1 - (n + 1) * tot AS DOUBLE) / (n * tot), 6) AS gini
FROM g
""",
)
def stats_gini_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document length (token count) within each
    source — the inequality diagnostic a curation pipeline reads before
    sampling (gini → 1: a few huge documents carry the source, so
    doc-uniform sampling and token-uniform sampling diverge badly).

    Computed from the sorted-rank identity
    G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) with ranks from a per-source
    window ordered by (x, doc_id) — tied lengths permute freely without
    changing Σ i·xᵢ, so the statistic is deterministic and every term
    is exact int64 (Σ i·x fits to ~10⁹ docs/source; DECIMAL(38,0)
    beyond). One shuffle on source for the rank window (linear per-key
    scan), then a map-side-combined aggregate; the only float op is the
    final division."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(F.split("text", " ")).cast("long").alias("x")
    )
    wr = Window.partitionBy("source").orderBy("x", "doc_id")
    r = docs.withColumn("i", F.row_number().over(wr))
    g = r.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("tot"),
        F.sum(F.col("i") * F.col("x")).alias("s1"),
    )
    return g.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("tot").cast("long").alias("sum_tokens"),
        F.round(
            (2 * F.col("s1") - (F.col("n") + 1) * F.col("tot")).cast("double")
            / (F.col("n") * F.col("tot")),
            6,
        ).alias("gini"),
    )


_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1997-06-01 00:00:00"
_Q3_TOPN = 10


@query(
    "tpch_q3_shipping",
    oracle=f"""
WITH rev AS (
  SELECT l.l_orderkey,
         {sql_dsum("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))", 'DECIMAL(20,4)')} AS revenue,
         o.o_orderdate, o.o_orderpriority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
    AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
    AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, o_orderdate ASC,
                               l_orderkey ASC) AS rank
  FROM rev
)
SELECT CAST(rank AS INT) AS rank, l_orderkey, revenue, o_orderdate, o_orderpriority
FROM ranked WHERE rank <= {_Q3_TOPN}
""",
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style composite (shipping priority): the top unshipped
    orders by revenue for one market segment — the benchmark's classic
    3-table join → aggregate → top-N, here as one declarative plan so
    Catalyst makes every scale decision: segment and date predicates
    push to the parquet scans, column pruning cuts lineitem to 4
    columns, AQE picks join strategy/side (customer-after-filter is
    broadcastable at small SF, shuffle join beyond), revenue is a
    map-side-combined decimal sum, and the top-10 compiles to
    TakeOrderedAndProject — no global sort. Rank is an explicit column
    with a (revenue, date, orderkey) total-order tiebreak per the
    registry's order-encoding convention."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == _Q3_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    )
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast(RATE) - dec("l_discount", RATE))).cast(
                    "decimal(20,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
    top = rev.orderBy(
        F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
    ).limit(_Q3_TOPN)
    w = Window.orderBy(
        F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
    )
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "l_orderkey", "revenue", "o_orderdate", "o_orderpriority"
    )


_Q4_START = "1996-01-01 00:00:00"
_Q4_END = "1996-04-01 00:00:00"


@query(
    "tpch_q4_priority",
    oracle=f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q4_START}'
  AND o.o_orderdate < TIMESTAMP '{_Q4_END}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style composite (order-priority checking): orders in
    one quarter having at least one line shipped after the order date,
    counted per priority — the canonical EXISTS shape. Expressed as a
    LEFT SEMI join so the lineitem side never materializes matches
    (first hit short-circuits, nothing duplicates, no distinct needed);
    the quarter predicate pushes to the orders scan and the semi join
    shuffles on orderkey with AQE sizing. The correlated ship-after-
    order predicate rides the join condition — Catalyst evaluates it
    inside the semi join, not in a post-filter."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


_Q5_REGION = "ASIA"
_Q5_START = "1996-01-01 00:00:00"
_Q5_END = "1997-01-01 00:00:00"


@query(
    "tpch_q5_local_supplier",
    oracle=f"""
WITH rev AS (
  SELECT n.n_name,
         {sql_dsum("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))", 'DECIMAL(20,4)')} AS revenue
  FROM customer c
  JOIN orders o   ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
                 AND c.c_nationkey = s.s_nationkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{_Q5_REGION}'
    AND o.o_orderdate >= TIMESTAMP '{_Q5_START}'
    AND o.o_orderdate <  TIMESTAMP '{_Q5_END}'
  GROUP BY n.n_name
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, n_name ASC) AS INT) AS rank,
       n_name, revenue
FROM rev
""",
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style composite (local supplier volume): revenue per
    nation for one region and one order year, counting only lineitems
    whose supplier sits in the customer's own nation — the benchmark's
    6-table join with a non-key equality (c_nationkey = s_nationkey)
    riding the supplier join. The star shape is declared and Catalyst
    makes the physical calls: region+nation collapse to broadcast hash
    joins (dimension tables are KBs at any SF), the date predicate
    pushes to the orders parquet scan, the customer⋈orders⋈lineitem
    chain shuffles on its keys with AQE picking build sides, and the
    nation-key equality prunes supplier rows inside the join rather
    than in a post-filter. Revenue is a map-side-combined decimal sum
    (order-independent per the registry convention); the ≤25-row result
    carries an explicit revenue-rank. At 100 TB nothing here changes:
    the only large shuffles are the two fact-fact joins, both on their
    natural keys."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION)
    asia_nations = F.broadcast(
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select("n_nationkey", "n_name")
    )
    rev = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(asia_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                (
                    dec("l_extendedprice")
                    * (F.lit(1).cast(RATE) - dec("l_discount", RATE))
                ).cast("decimal(20,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    return rev.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "n_name", "revenue"
    )


@query(
    "stats_chi2_independence",
    oracle="""
WITH cells AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY source, lang
),
margins AS (
  SELECT source, SUM(o) AS rt FROM cells GROUP BY source
),
colm AS (
  SELECT lang, SUM(o) AS ct FROM cells GROUP BY lang
),
tot AS (SELECT SUM(o) AS n FROM cells),
terms AS (
  SELECT CAST(ROUND(
           ((CAST(c.o AS DOUBLE) - (CAST(m.rt AS DOUBLE) * ct.ct) / t.n)
            * (CAST(c.o AS DOUBLE) - (CAST(m.rt AS DOUBLE) * ct.ct) / t.n))
           / ((CAST(m.rt AS DOUBLE) * ct.ct) / t.n), 9) AS DECIMAL(28,9)) AS term
  FROM cells c
  JOIN margins m ON c.source = m.source
  JOIN colm ct ON c.lang = ct.lang
  CROSS JOIN tot t
)
SELECT CAST(t.n AS BIGINT) AS n_docs,
       CAST((SELECT COUNT(*) FROM margins) AS INT) AS n_sources,
       CAST((SELECT COUNT(*) FROM colm) AS INT) AS n_langs,
       CAST(((SELECT COUNT(*) FROM margins) - 1)
            * ((SELECT COUNT(*) FROM colm) - 1) AS INT) AS dof,
       ROUND(CAST((SELECT SUM(term) FROM terms) AS DOUBLE), 6) AS chi2
FROM tot t
""",
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between `source` and
    `lang` over the corpus — the standard drift/bias monitor for a
    multi-source crawl mix (is language distribution independent of
    source, or did one feed's composition shift?). Completes the
    monitoring-stats family: KS compares a continuous measure across
    source pairs (stats_ks_source), this tests two categoricals
    jointly.

    Shape: ONE map-side-combined groupBy collapses the corpus to the
    sources × langs contingency table (≤ tens of cells at any data
    size); margins and the grand total re-aggregate that tiny frame —
    the raw table is scanned exactly once, everything after is
    broadcast-joined KB-sized metadata. Determinism: expected counts
    and per-cell terms are double arithmetic with identical
    parenthesization in both engines (each op a single correctly-
    rounded IEEE step), the term is rounded to 9 dp and summed in
    exact DECIMAL (order-independent), and the statistic is published
    at 6 dp — the same decimal-accumulation device as
    text_entropy_quality."""
    cells = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").cast("long").alias("o"))
    )
    margins = cells.groupBy("source").agg(F.sum("o").alias("rt"))
    colm = cells.groupBy("lang").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"), F.count("*").alias("n_cells"))
    e = (F.col("rt").cast("double") * F.col("ct")) / F.col("n")
    term = F.round(
        ((F.col("o").cast("double") - e) * (F.col("o").cast("double") - e)) / e, 9
    ).cast("decimal(28,9)")
    joined = (
        cells.join(F.broadcast(margins), "source")
        .join(F.broadcast(colm), "lang")
        .crossJoin(F.broadcast(tot))
    )
    ns = margins.agg(F.count("*").alias("n_sources"))
    nl = colm.agg(F.count("*").alias("n_langs"))
    return (
        joined.groupBy("n")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("chi2"))
        .crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(nl))
        .select(
            F.col("n").cast("long").alias("n_docs"),
            F.col("n_sources").cast("int").alias("n_sources"),
            F.col("n_langs").cast("int").alias("n_langs"),
            ((F.col("n_sources") - 1) * (F.col("n_langs") - 1))
            .cast("int")
            .alias("dof"),
            "chi2",
        )
    )


_Q7_START = "1996-01-01 00:00:00"
_Q7_END = "1998-01-01 00:00:00"


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
       {sql_dsum("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))", 'DECIMAL(20,4)')} AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q7_START}'
  AND l.l_shipdate <  TIMESTAMP '{_Q7_END}'
  AND s.s_nationkey <> c.c_nationkey
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style composite (volume shipping), generalized from the
    benchmark's fixed nation pair to the full cross-border trade-flow
    matrix: revenue per (supplier nation, customer nation, ship year)
    for two ship years, domestic flows excluded. The result is bounded
    by nations^2 x years (<= 25*24*2 rows) at ANY data size, so the
    whole reduction is one map-side-combined decimal aggregate. Plan
    shape: the ship-date predicate pushes to the lineitem scan (the
    biggest fact pruned first), the suppkey/orderkey/custkey chain
    shuffles on its natural keys with AQE picking build sides, the
    25-row nation table broadcasts onto BOTH key columns, and the
    cross-border inequality is evaluated on the integer nation keys
    inside the join chain - before the name lookups, so mismatched
    rows never reach them."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q7_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q7_END).cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    flows = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .join(
            F.broadcast(nation.alias("n1")),
            F.col("s_nationkey") == F.col("n1.n_nationkey"),
        )
        .join(
            F.broadcast(nation.alias("n2")),
            F.col("c_nationkey") == F.col("n2.n_nationkey"),
        )
    )
    return flows.groupBy(
        F.col("n1.n_name").alias("supp_nation"),
        F.col("n2.n_name").alias("cust_nation"),
        "l_year",
    ).agg(
        F.sum(
            (
                dec("l_extendedprice")
                * (F.lit(1).cast(RATE) - dec("l_discount", RATE))
            ).cast("decimal(20,4)")
        )
        .cast("double")
        .alias("revenue")
    )


_Q10_START = "1996-01-01 00:00:00"
_Q10_END = "1996-04-01 00:00:00"
_Q10_TOPN = 20


@query(
    "tpch_q10_returned_items",
    oracle=f"""
WITH rev AS (
  SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         {sql_dsum("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))", 'DECIMAL(20,4)')} AS revenue
  FROM customer c
  JOIN orders o   ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '{_Q10_START}'
    AND o.o_orderdate <  TIMESTAMP '{_Q10_END}'
    AND l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey ASC) AS rank
  FROM rev
)
SELECT CAST(rank AS INT) AS rank, c_custkey, c_name, revenue, c_acctbal, n_name
FROM ranked WHERE rank <= {_Q10_TOPN}
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style composite (returned-item reporting): the top
    customers by revenue lost to returns in one quarter - the classic
    "who is sending things back" triage list. Quarter and return-flag
    predicates push to the orders and lineitem scans respectively (the
    lineitem scan keeps ~1/3 of rows before any join), the
    customer-orders-lineitem chain shuffles on its keys, the 25-row
    nation lookup broadcasts, and the final top-20 compiles to
    TakeOrderedAndProject over the per-customer aggregate - no global
    sort at any scale. Rank is explicit with a (revenue desc, custkey)
    total order per the registry convention."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                (
                    dec("l_extendedprice")
                    * (F.lit(1).cast(RATE) - dec("l_discount", RATE))
                ).cast("decimal(20,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )
    top = rev.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(
        _Q10_TOPN
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "c_custkey", "c_name", "revenue", "c_acctbal", "n_name"
    )


_Q14_START = "1997-09-01 00:00:00"
_Q14_END = "1997-10-01 00:00:00"


@query(
    "tpch_q14_promo_share",
    oracle=f"""
WITH j AS (
  SELECT p.p_type,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))) AS rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{_Q14_START}'
    AND l.l_shipdate <  TIMESTAMP '{_Q14_END}'
)
SELECT
  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(rev AS DECIMAL(20,4)) ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE) AS promo_revenue,
  CAST(SUM(CAST(rev AS DECIMAL(20,4))) AS DOUBLE) AS total_revenue,
  round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(rev AS DECIMAL(20,4)) ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
        / CAST(SUM(CAST(rev AS DECIMAL(20,4))) AS DOUBLE), 6) AS promo_pct
FROM j
""",
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style composite (promotion effect): the share of one
    month's revenue attributable to promotional parts - a conditional
    aggregate over a fact-dimension join. The ship-month predicate
    pushes to the lineitem scan so only ~1/n of the fact table reaches
    the join; the part join shuffles on partkey (part grows with SF,
    so it is NOT hard-broadcast - AQE broadcasts it at small scale and
    shuffles beyond, which is the honest 100 TB shape). Both sums are
    map-side-combined exact decimals; the single output row carries the
    components and the 6-dp percentage so the oracle hash pins all
    three."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q14_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q14_END).cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        dec("l_extendedprice") * (F.lit(1).cast(RATE) - dec("l_discount", RATE))
    ).cast("decimal(20,4)")
    zero = F.lit(0).cast("decimal(20,4)")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey")).select(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(zero).alias("promo_rev"),
        rev.alias("rev"),
    )
    agg = j.agg(
        F.sum("promo_rev").cast("double").alias("promo_revenue"),
        F.sum("rev").cast("double").alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            100.0 * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_pct"),
    )


_Q18_MIN_QTY = 300
_Q18_TOPN = 100


@query(
    "tpch_q18_big_orders",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > {_Q18_MIN_QTY}
),
j AS (
  SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         b.total_qty
  FROM big b
  JOIN orders o   ON b.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM j
)
SELECT CAST(rank AS INT) AS rank, c_name, c_custkey, o_orderkey, o_orderdate,
       o_totalprice, total_qty
FROM ranked WHERE rank <= {_Q18_TOPN}
""",
)
def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style composite (large-volume customer): orders whose
    total line quantity exceeds a threshold, with their customers,
    ranked by order value - the aggregate-then-join shape where the
    HAVING filter must run BEFORE the joins so only the rare heavy
    orders (a fixed quantile of the order population at any SF) reach
    them. The quantity rollup is one map-side-combined decimal sum on
    the natural lineitem key; the surviving sliver joins orders and
    customer on their keys (AQE broadcasts the sliver side), and the
    top-100 compiles to TakeOrderedAndProject. Quantities are
    integer-valued; the decimal sum keeps the threshold comparison
    exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > _Q18_MIN_QTY)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = big.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    top = j.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc()).limit(
        _Q18_TOPN
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "total_qty",
    )


_Q6_START = "1997-01-01 00:00:00"
_Q6_END = "1998-01-01 00:00:00"


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       {sql_dsum("CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))", 'DECIMAL(20,4)')} AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_START}'
  AND l_shipdate <  TIMESTAMP '{_Q6_END}'
  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN CAST(0.05 AS DECIMAL(4,2)) AND CAST(0.07 AS DECIMAL(4,2))
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style composite (forecast revenue change): the revenue
    that would have been kept by dropping a discount band on small
    orders for one year - the benchmark's pure scan-and-sum whose whole
    point is PREDICATE PUSHDOWN: all three range predicates (ship year,
    discount band, quantity cap) and the 3-column projection reach the
    parquet reader, so row groups outside the year never decompress and
    no join or shuffle exists at all (one map-side partial sum, one
    1-row exchange). The discount comparison is done in DECIMAL on both
    engines because 0.05/0.07 are not representable in binary floating
    point and a double BETWEEN would be implementation-defined at the
    band edges - exactly the class of cross-engine flake the registry's
    decimal convention exists to kill."""
    li = load_table(spark, sf_dir, "lineitem")
    picked = li.filter(
        (F.col("l_shipdate") >= F.lit(_Q6_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q6_END).cast("timestamp"))
        & dec("l_discount", RATE).between(
            F.lit(0.05).cast(RATE), F.lit(0.07).cast(RATE)
        )
        & (F.col("l_quantity") < 24)
    )
    return picked.agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum((dec("l_extendedprice") * dec("l_discount", RATE)).cast("decimal(20,4)"))
        .cast("double")
        .alias("revenue_delta"),
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style composite (customer order distribution): how
    many customers placed 0, 1, 2, ... qualifying orders - the classic
    LEFT-OUTER-join-then-double-aggregate where the join predicate's
    extra filter (exclude urgent orders) must ride the JOIN CONDITION,
    not a WHERE clause, so that customers whose only orders are urgent
    still appear with count 0 (COUNT(o_orderkey) skips the null-
    extended rows; a WHERE would delete those customers entirely).
    Plan: one shuffle outer join on custkey, a map-side-combined count
    per customer, then a second tiny aggregate over the distinct count
    values (bounded by the max orders per customer at any SF). The
    orders side is pre-projected to two columns before the join."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


# Disjunctive (brand, size band, quantity band) triples — each OR arm
# narrows differently, the union of arms is what must reach the scan.
_Q19_ARMS = (
    ("Brand#12", 1, 15, 1, 15),
    ("Brand#23", 1, 20, 10, 25),
    ("Brand#14", 1, 25, 20, 35),
)


@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       {sql_dsum("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))", 'DECIMAL(20,4)')} AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE ((p.p_brand = '{_Q19_ARMS[0][0]}' AND p.p_size BETWEEN {_Q19_ARMS[0][1]} AND {_Q19_ARMS[0][2]}
        AND l.l_quantity >= {_Q19_ARMS[0][3]} AND l.l_quantity <= {_Q19_ARMS[0][4]})
    OR (p.p_brand = '{_Q19_ARMS[1][0]}' AND p.p_size BETWEEN {_Q19_ARMS[1][1]} AND {_Q19_ARMS[1][2]}
        AND l.l_quantity >= {_Q19_ARMS[1][3]} AND l.l_quantity <= {_Q19_ARMS[1][4]})
    OR (p.p_brand = '{_Q19_ARMS[2][0]}' AND p.p_size BETWEEN {_Q19_ARMS[2][1]} AND {_Q19_ARMS[2][2]}
        AND l.l_quantity >= {_Q19_ARMS[2][3]} AND l.l_quantity <= {_Q19_ARMS[2][4]}))
""",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style composite (discounted revenue, disjunctive
    predicates): revenue from three OR-ed (brand, size band, quantity
    band) arms - the benchmark's test that an optimizer can split a
    disjunction across join sides. Catalyst factors the part-only terms
    (brand IN (...), size <= max) and the lineitem-only terms (quantity
    within the union band) out of the OR and pushes each to its own
    scan, so both tables are pruned BEFORE the join and the exact
    disjunction is re-checked on the survivors; the join itself is a
    plain partkey equi-join sized by AQE. One decimal aggregate, one
    row out, with the qualifying line count pinned alongside the sum."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    arm = None
    for brand, smin, smax, qmin, qmax in _Q19_ARMS:
        this = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(smin, smax)
            & (F.col("l_quantity") >= qmin)
            & (F.col("l_quantity") <= qmax)
        )
        arm = this if arm is None else (arm | this)
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey")).filter(arm)
    return j.agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(
            (
                dec("l_extendedprice")
                * (F.lit(1).cast(RATE) - dec("l_discount", RATE))
            ).cast("decimal(20,4)")
        )
        .cast("double")
        .alias("revenue"),
    )


_Q22_CUTOFF = "2000-01-01 00:00:00"


@query(
    "tpch_q22_idle_capital",
    oracle=f"""
WITH avgbal AS (
  SELECT {sql_davg("CAST(c_acctbal AS DECIMAL(12,2))", 'DECIMAL(20,4)')} AS a
  FROM customer WHERE c_acctbal > 0
),
idle AS (
  SELECT c.c_custkey, c.c_nationkey, CAST(c.c_acctbal AS DECIMAL(12,2)) AS bal
  FROM customer c CROSS JOIN avgbal
  WHERE CAST(c.c_acctbal AS DOUBLE) > avgbal.a
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}')
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(bal) AS DOUBLE) AS total_acctbal
FROM idle JOIN nation n ON idle.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def tpch_q22_idle_capital(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style composite (global sales opportunity): customers
    holding above-average positive balances who placed NO recent orders,
    totaled per nation - the anti-join + scalar-subquery shape. The
    positive-balance mean is a 1-row decimal aggregate broadcast as the
    threshold (never a driver-side collect - it rides the plan as a
    broadcast nested loop over one row); recent orders are pre-filtered
    by the pushed date predicate and the customer side drops matches
    via LEFT ANTI join on custkey (first match short-circuits, nothing
    materializes); the 25-row nation lookup broadcasts. The mean
    comparison is decimal-sum/count cast to double with identical
    parenthesization on both engines, so threshold membership can never
    flip between them."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avgbal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("a")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    idle = (
        cust.crossJoin(F.broadcast(avgbal))
        .filter(F.col("c_acctbal").cast("double") > F.col("a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        idle.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_custs"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


@query(
    "stats_token_deciles",
    oracle="""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS x
  FROM documents
),
r AS (
  SELECT source, x,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM t
)
SELECT source, CAST(d.d AS INT) AS decile, CAST(x AS BIGINT) AS cut_tokens
FROM r, range(1, 10) d(d)
WHERE rn = CAST(ceil(d.d * n / 10.0) AS BIGINT)
""",
)
def stats_token_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-source decile cut-points of document token length by
    the nearest-rank definition (cut_d = value at rank ceil(d*n/10)) —
    the distribution profile behind packing-length and truncation
    decisions, where the approximate-quantile sketch
    (agg_approx_quantiles) is not defensible because downstream
    thresholds get hard-coded from it. Exactness costs one per-source
    rank window (hash-partitioned by source, linear per key — never a
    global sort); the 9-way decile fan-out is a broadcast of a 9-row
    literal range against the already-ranked frame, and only the 9
    matching rows per source survive the filter. Nearest-rank picks an
    ACTUAL data value (no interpolation), so both engines agree
    exactly, with doc_id breaking ties inside equal lengths without
    affecting the selected value."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(F.split("text", " ")).cast("long").alias("x")
    )
    w = Window.partitionBy("source").orderBy("x", "doc_id")
    wn = Window.partitionBy("source")
    r = docs.select(
        "source",
        "x",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    deciles = spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    return (
        r.crossJoin(F.broadcast(deciles))
        .filter(
            F.col("rn")
            == F.ceil(F.col("decile") * F.col("n") / F.lit(10.0)).cast("long")
        )
        .select("source", "decile", F.col("x").alias("cut_tokens"))
    )


_ZIPF_TOP = 100


@query(
    "stats_zipf_slope",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY token
),
ranked AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, token ASC) AS r
  FROM freq
),
top AS (
  SELECT log10(CAST(r AS DOUBLE)) AS x, log10(CAST(f AS DOUBLE)) AS y
  FROM ranked WHERE r <= {_ZIPF_TOP}
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM top
)
SELECT n AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS zipf_intercept
FROM s
""",
)
def stats_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus unigram distribution: least-squares
    slope (and intercept) of log10(frequency) against log10(rank) for
    the top terms — the single-number corpus-health check (natural text
    sits near slope −1; template/boilerplate floods flatten it, OCR
    noise steepens the tail). Shape: one map-side-combined token count
    (the only corpus-sized shuffle), top-100 by frequency via
    orderBy().limit() — TakeOrderedAndProject, never a global sort —
    then the closed-form normal-equation slope over ≤100 rows with the
    identical parenthesization on both engines; ranks are exact
    integers with a token tie-break, logs/sums run over a bounded frame
    so double reassociation stays under the 6-dp rounding. At 100 TB
    the fit frame is still 100 rows."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("f"))
    )
    top = freq.orderBy(F.col("f").desc(), F.col("token").asc()).limit(_ZIPF_TOP)
    w = Window.orderBy(F.col("f").desc(), F.col("token").asc())
    xy = top.select(
        F.log10(F.row_number().over(w).cast("double")).alias("x"),
        F.log10(F.col("f").cast("double")).alias("y"),
    )
    s = xy.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "zipf_intercept"
        ),
    )


_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_18"
_Q8_PTYPE = "STANDARD"
_Q8_START = "1996-01-01 00:00:00"
_Q8_END = "1998-01-01 00:00:00"


@query(
    "tpch_q8_market_share",
    oracle=f"""
WITH flows AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
         n2.n_name AS supp_nation,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))) AS rev
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = '{_Q8_REGION}'
    AND p.p_type = '{_Q8_PTYPE}'
    AND o.o_orderdate >= TIMESTAMP '{_Q8_START}'
    AND o.o_orderdate <  TIMESTAMP '{_Q8_END}'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}'
                     THEN CAST(rev AS DECIMAL(20,4))
                     ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE) AS nation_revenue,
       CAST(SUM(CAST(rev AS DECIMAL(20,4))) AS DOUBLE) AS market_revenue,
       round(CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}'
                           THEN CAST(rev AS DECIMAL(20,4))
                           ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(rev AS DECIMAL(20,4))) AS DOUBLE), 6) AS mkt_share
FROM flows GROUP BY o_year
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style composite (national market share): one supplier
    nation's share of a regional market's revenue for one product type,
    per order year — the 8-table join whose point is that the optimizer
    must keep the SELECTIVE dimension filters (region, product type,
    two order years) ahead of the fact-fact joins. Catalyst does: the
    p_type and date predicates push to the part/orders scans, region
    prunes nation before the broadcast, and the share's numerator is a
    conditional decimal aggregate over the SAME rows as the
    denominator (one pass — never two scans reconciled later). Both
    component revenues are published alongside the 6-dp share so the
    oracle hash pins all three. At 100 TB the only large shuffles are
    lineitem⋈part, ⋈orders and ⋈customer, each on its natural key;
    nation/region broadcast at any SF, supplier by AQE's choice."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == _Q8_PTYPE
    ).select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q8_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q8_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").cast("int").alias("o_year"))
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    mkt_nations = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_nationkey").alias("mkt_nationkey"))
    )
    supp_nation = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    rev = (
        dec("l_extendedprice") * (F.lit(1).cast(RATE) - dec("l_discount", RATE))
    ).cast("decimal(20,4)")
    zero = F.lit(0).cast("decimal(20,4)")
    flows = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(mkt_nations, F.col("c_nationkey") == F.col("mkt_nationkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(supp_nation, F.col("s_nationkey") == F.col("sn_key"))
        .select(
            "o_year",
            F.when(F.col("supp_nation") == _Q8_NATION, rev).otherwise(zero).alias(
                "nat_rev"
            ),
            rev.alias("rev"),
        )
    )
    agg = flows.groupBy("o_year").agg(
        F.sum("nat_rev").cast("double").alias("nation_revenue"),
        F.sum("rev").cast("double").alias("market_revenue"),
    )
    return agg.select(
        "o_year",
        "nation_revenue",
        "market_revenue",
        F.round(F.col("nation_revenue") / F.col("market_revenue"), 6).alias(
            "mkt_share"
        ),
    )


_Q15_START = "1996-01-01 00:00:00"
_Q15_END = "1996-04-01 00:00:00"


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey,
         {sql_dsum("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))", 'DECIMAL(20,4)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_START}'
    AND l_shipdate <  TIMESTAMP '{_Q15_END}'
  GROUP BY l_suppkey
),
mx AS (SELECT MAX(total_revenue) AS m FROM rev)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
CROSS JOIN mx WHERE r.total_revenue = mx.m
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style composite (top supplier): the supplier(s) whose
    shipped revenue in one quarter equals the maximum — the
    equal-to-scalar-aggregate shape (the benchmark wants a view +
    subquery; here the per-supplier aggregate is computed ONCE and the
    1-row max rides back as a broadcast, so the fact table is scanned
    exactly once, not once per subquery). Equality on a float maximum
    is normally a correctness trap — it is safe here, and identical
    across engines, because total_revenue is an exact decimal sum on
    both sides (the registry's determinism convention doing real work,
    not just hash-stabilizing). Ties all surface. The final supplier
    lookup joins on suppkey after the aggregate, so the join input is
    |suppliers-with-sales|, never |lineitem|."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_END).cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (
                dec("l_extendedprice")
                * (F.lit(1).cast(RATE) - dec("l_discount", RATE))
            ).cast("decimal(20,4)")
        )
        .cast("double")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q17_BRAND = "Brand#7"


@query(
    "tpch_q17_small_qty_revenue",
    oracle=f"""
WITH target AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = '{_Q17_BRAND}'
),
thresh AS (
  SELECT l_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) AS t
  FROM target GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       {sql_dsum("CAST(l_extendedprice AS DECIMAL(12,2))", 'DECIMAL(20,4)')} AS small_qty_revenue,
       round({sql_dsum("CAST(l_extendedprice AS DECIMAL(12,2))", 'DECIMAL(20,4)')} / 7.0, 6) AS avg_yearly
FROM target g JOIN thresh th ON g.l_partkey = th.l_partkey
WHERE g.l_quantity < th.t
""",
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style composite (small-quantity-order revenue): the
    revenue sitting in orders below 20% of each part's own average
    order quantity, for one brand — the correlated-aggregate-subquery
    shape. Expressed as aggregate-then-self-join: the brand's lineitems
    are scanned ONCE into a narrow frame, the per-part average reduces
    it (map-side combined), and the threshold joins back on partkey —
    Catalyst never re-executes the subquery per row, and AQE broadcasts
    the per-part threshold table (|parts of one brand| rows — tiny at
    any SF). The threshold itself is 0.2 · (decimal-sum / count) with
    identical parenthesization on both engines, so the strict < at the
    boundary can never disagree. Published as line count, exact decimal
    revenue, and the benchmark's avg-yearly form (revenue / 7)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == _Q17_BRAND
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    target = li.join(part, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresh = target.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (F.sum(dec("l_quantity")).cast("double") / F.count("*"))
        ).alias("t")
    ).withColumnRenamed("l_partkey", "t_partkey")
    small = target.join(
        F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey")
    ).filter(F.col("l_quantity") < F.col("t"))
    return small.agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(dec("l_extendedprice").cast("decimal(20,4)"))
        .cast("double")
        .alias("small_qty_revenue"),
        F.round(
            F.sum(dec("l_extendedprice").cast("decimal(20,4)")).cast("double")
            / F.lit(7.0),
            6,
        ).alias("avg_yearly"),
    )

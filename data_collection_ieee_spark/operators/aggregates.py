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
    precise counterpart of `agg_approx_quantiles`. At 100 TB the approx
    sketch is the default path and this is the audited spot-check, so
    both live in the surface.

    Plan — bucket-selected rank, NOT Spark's `percentile()` aggregate
    and NOT a full per-group sort either. `percentile()` buffers every
    group value into one merge task's aggregation buffer (the r7
    sf1→sf10 trend measured it at 48.5× per decade). The first fix —
    a per-(group, metric) row_number window — removed the buffering
    but still externally SORTED every row through 3×2 window tasks
    (8.56× per decade, and a fixed 6-way parallelism ceiling at any
    cluster size). Since only the two rows bracketing each percentile
    position are ever consumed, full ranking is waste: the
    `_ntile4_dense` literal-boundary pattern (see windows.py) finds
    them with NO global sort — per-(group, metric) approx bounds cut
    the values into NB = 1024 buckets, a tiny counts job turns bucket
    sizes into exact rank offsets, the driver resolves WHICH bucket
    holds each target rank (bounded metadata: ≤6×1026 counts), and
    only those ≤9 bracketing buckets (~1/1024 of the data each under
    a uniform spread) are sorted — local row_number + offset is the
    exact global rank. The surviving `ranked` frame has the same
    (group, metric, v, rn, n) contract, so bracketing + interpolation
    below are untouched: lo + frac·(hi − lo), the identical
    percentile_cont formula (and parenthesization) both engines use,
    rounded to 4 places.

    Round-9 adjudication (idle-host interleaved A/B vs the rank-filter
    two-pass this replaced, tools/median_ab.py): sf0.1 5.2 s vs 2.1 s,
    sf1 7.5 s vs 13.0 s, sf10 20.2 s vs 180.7 s — the two extra scans
    cost ~3 s flat while the rank-filter's 6-task sort ceiling grows
    superlinearly, so the crossover sits just past sf0.1 and the
    bucket form is ~9× faster at sf10. Kept; re-frozen in BASELINE.md
    Addendum 9.

    Bucketing is EQUAL-WIDTH (`width_bucket` on per-group min/max —
    one JVM call per row), not quantile bounds: a per-group CASE chain
    over quantile boundaries costs groups×buckets comparisons per row
    (measured 2.6× slower than the full sort it replaced at 128
    buckets), and bucket BALANCE is irrelevant for CORRECTNESS — the
    counts job yields exact offsets for any partitioning; balance only
    caps the size of the few buckets actually sorted. Under a
    pathological heavy tail (most values equal ⇒ one bucket holds the
    group), the kept-bucket sort degrades to the rank-filter form's
    per-group sort — same answer, never asymptotically worse than the
    plan this replaced (skew pytest pins the exact result and that
    only bracketing buckets are sorted).

    Groups whose metric is entirely NULL keep their row with NULL
    estimates (percentile_cont semantics): stats are taken BEFORE the
    NULL filter with count(v)/min(v)/max(v) null-skipping aggregates,
    and the estimate frame is left-joined back onto the flag domain
    collected in the same job (r8 ADVICE: the old pre-filter dropped
    all-NULL groups entirely while the DuckDB oracle kept them)."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.select(
        "l_returnflag",
        F.explode(
            F.create_map(
                F.lit("qty"), F.col("l_quantity").cast("double"),
                F.lit("price"), F.col("l_extendedprice").cast("double"),
            )
        ).alias("metric", "v"),
    )

    NB = 1024
    # Decision metadata in ONE job (OPTIMIZATION r14, guide §1.2): the
    # stats and bucket-counts collects previously ran as two SERIALIZED
    # driver barriers ahead of the final job — three full passes in
    # strict sequence. The per-group bounds now reach the bucketing as
    # a broadcast join of the persisted 6-row stats frame (instead of
    # driver-literal maps), the counts frame joins back onto it, and
    # ONE collect returns stats and counts together: the stats and
    # counts scans overlap inside a single job. Stats are taken BEFORE
    # the NULL filter: count(v)/min(v)/max(v) skip NULLs
    # (percentile_cont semantics) but an all-NULL group still yields a
    # row (n = 0, no bucket rows), so the flag domain for the final
    # left-join is known from this same bounded collect — no extra scan.
    from data_collection_ieee_spark.catalog import persist_tracked

    stats_df = persist_tracked(
        long.groupBy("l_returnflag", "metric").agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count("v").alias("n"),
        )
    )
    long_nn = long.filter(F.col("v").isNotNull())

    def _bucketed() -> DataFrame:
        # width_bucket needs lo < hi; a constant-valued group
        # degenerates to one bucket (bucket 0), which the offsets
        # handle like any other
        bucket = F.when(
            F.col("lo") < F.col("hi"),
            F.width_bucket(F.col("v"), F.col("lo"), F.col("hi"), F.lit(NB)),
        ).otherwise(F.lit(0))
        return (
            long_nn.join(F.broadcast(stats_df), ["l_returnflag", "metric"])
            .select(
                "l_returnflag",
                "metric",
                "v",
                "n",
                bucket.cast("int").alias("_bkt"),
            )
        )

    cnts_df = (
        _bucketed()
        .groupBy("l_returnflag", "metric", "_bkt")
        .agg(F.count("*").alias("cnt"))
    )
    combined = stats_df.join(
        F.broadcast(cnts_df), ["l_returnflag", "metric"], "left"
    ).collect()
    if not combined:
        return spark.createDataFrame(
            [],
            "l_returnflag string, med_qty double, p90_qty double, med_price double",
        )
    stats = list(
        {(r["l_returnflag"], r["metric"]): r for r in combined}.values()
    )
    cnts = [r for r in combined if r["_bkt"] is not None]
    offsets: dict[tuple, int] = {}
    sizes: dict[tuple, int] = {}
    acc: dict[tuple, int] = {}
    for r in sorted(cnts, key=lambda r: (r["l_returnflag"], r["metric"], r["_bkt"])):
        g = (r["l_returnflag"], r["metric"])
        key = (r["l_returnflag"], r["metric"], r["_bkt"])
        offsets[key] = acc.get(g, 0)
        sizes[key] = r["cnt"]
        acc[g] = offsets[key] + r["cnt"]
    # driver-side: which bucket holds each target rank (k+1 and k+2,
    # mirroring the rn filter below exactly — k = floor(p·(n−1)) in
    # the same double arithmetic Spark evaluates)
    import math

    plan = [("qty", 0.5), ("qty", 0.9), ("price", 0.5)]
    keep: set[tuple] = set()
    for r in stats:
        g = (r["l_returnflag"], r["metric"])
        n = r["n"]
        for metric, p in plan:
            if metric != r["metric"]:
                continue
            kk = math.floor(p * (n - 1))
            for rank in (kk + 1, kk + 2):
                if rank > n:
                    continue
                for key, off in offsets.items():
                    if key[:2] == g and off < rank <= off + sizes[key]:
                        keep.add(key)
    keep_pred = F.lit(False)
    for flag, metric, bkt in sorted(keep):
        keep_pred = keep_pred | (
            (F.col("l_returnflag") == F.lit(flag))
            & (F.col("metric") == F.lit(metric))
            & (F.col("_bkt") == F.lit(bkt))
        )
    # offsets literal map for the KEPT buckets only (OPTIMIZATION r14):
    # the old map carried every populated bucket (~6x1026 literals — a
    # multi-thousand-node expression tree paid at plan build/optimize/
    # codegen time) although rn + offset is only ever evaluated on rows
    # that survived keep_pred. n rides the broadcast stats join now.
    omap = F.create_map(
        *[
            F.lit(x)
            for (flag, metric, bkt), off in offsets.items()
            if (flag, metric, bkt) in keep
            for x in (f"{flag}|{metric}|{bkt}", off)
        ]
    )
    wb = Window.partitionBy("l_returnflag", "metric", "_bkt").orderBy("v")
    ranked = (
        _bucketed()
        .filter(keep_pred)
        .repartition("l_returnflag", "metric", "_bkt")
        .select(
            "l_returnflag",
            "metric",
            "v",
            (
                F.row_number().over(wb)
                + omap[F.concat_ws("|", "l_returnflag", "metric", "_bkt")]
            ).alias("rn"),
            "n",
        )
    )
    targets = spark.createDataFrame(
        [("qty", 0.5, "med_qty"), ("qty", 0.9, "p90_qty"), ("price", 0.5, "med_price")],
        "metric string, p double, target string",
    )
    # 0-indexed continuous position p·(n−1); keep ranks k and k+1
    # (1-indexed: ⌊pos⌋+1 and ⌊pos⌋+2) that bracket it
    pos = F.col("p") * (F.col("n") - 1).cast("double")
    k = F.floor(pos)
    bracketed = (
        ranked.join(F.broadcast(targets), "metric")
        .withColumn("k", k)
        .withColumn("frac", pos - k.cast("double"))
        .filter((F.col("rn") == F.col("k") + 1) | (F.col("rn") == F.col("k") + 2))
    )
    est = (
        bracketed.groupBy("l_returnflag", "target")
        .agg(
            F.min("frac").alias("frac"),
            F.min(F.when(F.col("rn") == F.col("k") + 1, F.col("v"))).alias("lo"),
            F.min(F.when(F.col("rn") == F.col("k") + 2, F.col("v"))).alias("hi"),
        )
        .withColumn(
            "est",
            F.round(
                F.col("lo")
                + F.col("frac") * (F.coalesce("hi", "lo") - F.col("lo")),
                4,
            ),
        )
    )
    pivoted = est.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("target") == "med_qty", F.col("est"))).alias("med_qty"),
        F.min(F.when(F.col("target") == "p90_qty", F.col("est"))).alias("p90_qty"),
        F.min(F.when(F.col("target") == "med_price", F.col("est"))).alias("med_price"),
    )
    # left-join back onto the full flag domain (known from the stats
    # collect) so an all-NULL group keeps its row with NULL estimates,
    # matching the oracle's GROUP BY; null-safe on for a NULL flag group
    flags = sorted({r["l_returnflag"] for r in stats}, key=lambda x: (x is None, x))
    flags_df = spark.createDataFrame([(f,) for f in flags], "l_returnflag string")
    return flags_df.join(
        F.broadcast(pivoted),
        on=flags_df["l_returnflag"].eqNullSafe(pivoted["l_returnflag"]),
        how="left",
    ).select(flags_df["l_returnflag"], "med_qty", "p90_qty", "med_price")


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
    "agg_weighted_percentiles",
    oracle="""
WITH d AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS v,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w
  FROM documents
),
t AS (SELECT lang, SUM(w) AS tw FROM d GROUP BY lang),
c AS (
  SELECT lang, v, w,
         SUM(w) OVER (PARTITION BY lang ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw
  FROM d
)
SELECT c.lang,
       MIN(CASE WHEN 2 * cw >= t.tw THEN v END) AS w_med,
       MIN(CASE WHEN 10 * cw >= 9 * t.tw THEN v END) AS w_p90
FROM c JOIN t ON c.lang = t.lang
GROUP BY c.lang
""",
)
def agg_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED percentiles (lower weighted median / p90) of
    document length, weighted by token count, per language — the
    mix-design primitive: "half the TOKENS (not docs) of this language
    sit in docs shorter than X". The lower weighted p-percentile is the
    smallest v whose cumulative weight reaches p of the total; both
    thresholds are exact integer cross-multiplications (2·cum ≥ tw,
    10·cum ≥ 9·tw) so no float touches a boundary, and ties on v are
    order-safe (a tie group satisfies iff its full prefix sum does).

    Plan — the round-9 bucket-selected rank device (agg_median_exact's
    A/B-validated pattern), generalized from row ranks to weight mass:
    per-lang min/max bounds cut v into 1024 equal-width buckets, one
    counts job sums WEIGHT per (lang, bucket) (bounded collect:
    langs×1025), the driver walks the cumulative weights to find which
    bucket each percentile's crossing lands in, and only those ≤2
    buckets per lang are windowed — the cumulative sum inside a kept
    bucket plus the driver's bucket offset is the exact global
    cumulative weight. No full sort, no low-cardinality window over
    the whole table, all collects bounded metadata."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.col("n_chars").cast("long").alias("v"),
        F.size(F.split("text", " ")).cast("long").alias("w"),
    )
    NB = 1024
    stats = (
        d.groupBy("lang")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.sum("w").alias("tw"))
        .collect()
    )
    if not stats:
        return spark.createDataFrame([], "lang string, w_med long, w_p90 long")
    lomap = F.create_map(*[F.lit(x) for r in stats for x in (r["lang"], r["lo"])])
    himap = F.create_map(*[F.lit(x) for r in stats for x in (r["lang"], r["hi"])])
    bucket = F.when(
        lomap[F.col("lang")] < himap[F.col("lang")],
        F.width_bucket(F.col("v"), lomap[F.col("lang")], himap[F.col("lang")], F.lit(NB)),
    ).otherwise(F.lit(0))
    bucketed = d.select("*", bucket.cast("int").alias("_bkt"))

    wsums = (
        bucketed.groupBy("lang", "_bkt").agg(F.sum("w").alias("bw")).collect()
    )
    tw_by_lang = {r["lang"]: r["tw"] for r in stats}
    # driver: cumulative weight offsets per bucket; the crossing bucket
    # for p = num/den is the first whose end-cum satisfies
    # den·cum ≥ num·tw
    plan = [(1, 2, "w_med"), (9, 10, "w_p90")]
    offsets: dict[tuple, int] = {}
    keep: set[tuple] = set()
    acc: dict[str, int] = {}
    found: set[tuple] = set()
    for r in sorted(wsums, key=lambda r: (r["lang"], r["_bkt"])):
        lang, bkt, bw = r["lang"], r["_bkt"], r["bw"]
        off = acc.get(lang, 0)
        offsets[(lang, bkt)] = off
        end_cum = off + bw
        acc[lang] = end_cum
        tw = tw_by_lang[lang]
        for num, den, tgt in plan:
            if (lang, tgt) not in found and den * end_cum >= num * tw:
                keep.add((lang, bkt))
                found.add((lang, tgt))
    keep_pred = F.lit(False)
    for lang, bkt in sorted(keep):
        keep_pred = keep_pred | (
            (F.col("lang") == F.lit(lang)) & (F.col("_bkt") == F.lit(bkt))
        )
    omap = F.create_map(
        *[
            F.lit(x)
            for (lang, bkt), off in offsets.items()
            for x in (f"{lang}|{bkt}", off)
        ]
    )
    twmap = F.create_map(*[F.lit(x) for r in stats for x in (r["lang"], r["tw"])])
    wc = (
        Window.partitionBy("lang", "_bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        bucketed.filter(keep_pred)
        .repartition("lang", "_bkt")
        .select(
            "lang",
            "v",
            (
                F.sum("w").over(wc) + omap[F.concat_ws("|", "lang", "_bkt")]
            ).alias("cw"),
            twmap[F.col("lang")].alias("tw"),
        )
    )
    return cum.groupBy("lang").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v"))).alias("w_med"),
        F.min(F.when(10 * F.col("cw") >= 9 * F.col("tw"), F.col("v"))).alias("w_p90"),
    )


@query("agg_count_min_sketch")
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation over the event stream —
    the heavy-hitter counting sketch that completes the approximate
    family (HLL cardinality: agg_approx_distinct/sketch_reaggregate;
    quantiles: agg_approx_quantiles; membership: join_bloom_prefilter).
    Builds one CMS (ε=0.001, δ=0.01, fixed seed ⇒ deterministic) over
    user_id-tagged event keys in a single distributed aggregate, then
    reads estimates for the event-type keys back beside their exact
    counts. No oracle by design (DuckDB has no CMS); the pytest pins
    the CMS one-sided-error contract (estimate ≥ exact, bounded
    relative overshoot).

    Scale: the sketch is FIXED-SIZE regardless of stream volume (the
    point of a sketch — ~w·d counters), merged associatively across
    partitions by the JVM aggregate; the only driver transfer is that
    bounded blob plus the ≤5-row exact side. At 100 TB this is the
    shape of a streaming top-talkers monitor: one pass, KB of state."""
    ev = load_table(spark, sf_dir, "events")
    blob = bytes(
        ev.agg(
            F.expr(
                "count_min_sketch(event_type, 0.001d, 0.99d, 42)"
            ).alias("cms")
        ).head()[0]
    )
    exact = ev.groupBy("event_type").agg(F.count("*").alias("exact_n"))
    rows = exact.collect()  # bounded: one row per event type (5)
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(blob)
    est = [
        (r["event_type"], r["exact_n"], int(cms.estimateCount(r["event_type"])))
        for r in rows
    ]
    out = spark.createDataFrame(
        est, "event_type string, exact_n long, cms_n long"
    )
    return out.select(
        "event_type",
        "exact_n",
        "cms_n",
        F.round(
            (F.col("cms_n") - F.col("exact_n")).cast("double")
            / F.col("exact_n"),
            6,
        ).alias("rel_overshoot"),
    )


# Heavy-hitter threshold: report every token whose corpus frequency
# exceeds total/K. Per-partition Misra–Gries with K counters is the
# candidate stage: pigeonhole guarantees any token with global count
# > N/K exceeds n_p/K in at least one partition, so the union of
# per-partition sketches is a SUPERSET of the true heavy hitters —
# the exact verify pass then removes the false positives, making the
# final answer exact (and hash-oracled).
_HH_K = 200


@query(
    "agg_heavy_hitters",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
tot AS (SELECT COUNT(*) AS total FROM tok)
SELECT t.token, COUNT(*) AS cnt,
       round(CAST(COUNT(*) AS DOUBLE) / tot.total, 6) AS share
FROM tok t, tot
GROUP BY t.token, tot.total
HAVING COUNT(*) * {_HH_K} > tot.total
""",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (tokens with frequency > N/200) via
    the two-pass Misra–Gries pattern — the scale-correct alternative
    to a full vocabulary groupBy when the token space is enormous and
    the answer is tiny.

    Pass 1 (candidates): per-partition Misra–Gries summaries with
    K=200 counters each, run inside ``mapInPandas`` over the raw
    document partitions (tokenization stays in the Arrow batch, no
    exploded-token shuffle). Each partition emits at most K candidate
    tokens plus one sentinel row carrying its token count (so the
    corpus total needs no extra scan); the sketch output is a bounded
    ~K x partitions frame, checkpointed once and broadcast.

    Pass 2 (verify): exact counts of ONLY the candidate tokens — the
    explode is filtered map-side by the broadcast candidate set before
    the shuffle, so the aggregation exchanges |candidates| x
    |partitions| combined rows instead of |vocabulary|. Tokens at or
    under the N/K threshold are dropped; the result is exactly the set
    an (unaffordable) full groupBy + HAVING would return, which is
    what the DuckDB oracle runs at fixture scale.

    The threshold compare is integer (cnt * K > N) — no float
    boundary; `share` is a single division rounded to 6dp.
    """
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("text")

    def mg_partition(batches):
        counters: dict[str, int] = {}
        n_tokens = 0
        for pdf in batches:
            for text in pdf["text"]:
                if text is None:  # oracle's string_split(NULL) yields
                    continue  # no tokens; match it (ADVICE r9)
                toks = text.split(" ")
                n_tokens += len(toks)
                for tok in toks:
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < _HH_K:
                        counters[tok] = 1
                    else:
                        dead = []
                        for key in counters:
                            counters[key] -= 1
                            if counters[key] == 0:
                                dead.append(key)
                        for key in dead:
                            del counters[key]
        # sentinel row (token NULL) carries the partition token count so
        # the corpus total needs no third scan of the documents
        yield pd.DataFrame(
            {
                "token": list(counters.keys()) + [None],
                "part_total": [None] * len(counters) + [n_tokens],
            }
        )

    sketch = docs.mapInPandas(
        mg_partition, "token string, part_total long"
    ).localCheckpoint(eager=True)  # bounded: ≤ (K+1) x n_partitions rows
    candidates = sketch.filter(F.col("token").isNotNull()).select("token").distinct()
    total = sketch.filter(F.col("token").isNull()).groupBy().agg(
        F.sum("part_total").alias("total")
    )

    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    exact = (
        tok.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
    )
    return exact.filter(F.col("cnt") * _HH_K > F.col("total")).select(
        "token",
        "cnt",
        F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias("share"),
    )


_PD_QUANTILES = (25, 50, 75, 95)  # integer percents: rank math stays exact


@query(
    "agg_percentile_disc",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n,
       CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE) AS p25,
       CAST(quantile_disc(l_quantity, 0.50) AS DOUBLE) AS p50,
       CAST(quantile_disc(l_quantity, 0.75) AS DOUBLE) AS p75,
       CAST(quantile_disc(l_quantity, 0.95) AS DOUBLE) AS p95
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank (discrete) percentiles of order quantity per
    return flag — the PERCENTILE_DISC twin of the interpolated family
    (`agg_median_exact`, `agg_weighted_percentiles` interpolate;
    reporting SLAs often demand "a value that actually occurs").
    Definition: the q-percentile is the element at 1-based rank
    ceil(q*n) of the sorted group — DuckDB's quantile_disc semantics,
    verified against a 42-case probe grid including the exact integer
    boundaries (n*q integral) where naive float ceil is off by one;
    the rank is computed in pure integer arithmetic
    ((n*k + 99) div 100), so there is no float boundary at any n.

    Plan shape (NOT a sort): nearest-rank selection needs only the
    value-frequency CDF, so the plan is one combiner-bounded groupBy
    to (flag, value) counts — map-side combine collapses any row
    volume to |flags| x |distinct values| x |partitions| — then a
    window cumsum over that bounded distinct frame (3 x 50 rows here,
    never row-scale) and a rank-containment pick. A global
    sort-within-group percentile would put each flag's full row mass
    through one task; this shape's shuffle is frequency-sized at any
    corpus size. For value columns with unbounded distinct counts the
    bucket-selection device of `agg_median_exact` /
    `agg_weighted_percentiles` composes in front (first narrow the
    rank to one bucket, then run this CDF pick inside it)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("double").alias("v")
    )
    cnt = li.groupBy("l_returnflag", "v").agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cnt.withColumn("cum_hi", F.sum("c").over(w)).withColumn(
        "cum_lo", F.col("cum_hi") - F.col("c") + 1
    )
    tot = cnt.groupBy("l_returnflag").agg(F.sum("c").alias("n"))
    j = cum.join(F.broadcast(tot), "l_returnflag")
    picks = [
        F.max(
            F.when(
                (F.expr(f"(n * {k} + 99) div 100") >= F.col("cum_lo"))
                & (F.expr(f"(n * {k} + 99) div 100") <= F.col("cum_hi")),
                F.col("v"),
            )
        ).alias(f"p{k}")
        for k in _PD_QUANTILES
    ]
    return j.groupBy("l_returnflag", "n").agg(*picks).select(
        "l_returnflag", F.col("n").cast("long").alias("n"), "p25", "p50", "p75", "p95"
    )

"""Statistical profile operators (SURVEY.md §2C "aggregates/stats
widening") — correlation, KS, Gini, chi-square, exact deciles, Zipf.

Split from operators/aggregates.py (round 7, VERDICT r6 item 5): same
registry names, byte-identical query bodies; `load_all()` imports this
module alongside aggregates/tpch so registration is unchanged.

All exactness conventions follow the registry docstring: decimal sums
for anything the oracle hashes, integer-exact thresholds, explicit rank
columns instead of ORDER BY. Reference lineage: the reference computes
no statistics at all (main.py stops at CSV export); this module is the
profiling surface a curation campaign runs over the same schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table
from data_collection_ieee_spark.functions.exact import dec
from data_collection_ieee_spark.registry import query

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


@query(
    "stats_welch_ttest",
    oracle="""
WITH m AS (
  SELECT lang, doc_id % 2 AS cohort,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
  FROM documents GROUP BY lang, doc_id % 2
),
ab AS (
  SELECT a.lang,
         a.n AS n_a, b.n AS n_b,
         CAST(a.s AS DOUBLE) / a.n AS mean_a,
         CAST(b.s AS DOUBLE) / b.n AS mean_b,
         (CAST(a.ss AS DOUBLE) - (CAST(a.s AS DOUBLE) * a.s) / a.n) / (a.n - 1)
           AS var_a,
         (CAST(b.ss AS DOUBLE) - (CAST(b.s AS DOUBLE) * b.s) / b.n) / (b.n - 1)
           AS var_b
  FROM m a JOIN m b ON a.lang = b.lang AND a.cohort = 0 AND b.cohort = 1
)
SELECT lang, n_a, n_b,
       ROUND(mean_a, 6) AS mean_a, ROUND(mean_b, 6) AS mean_b,
       ROUND((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6) AS t_stat,
       ROUND(((var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b))
             / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
                + (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 6) AS df_welch
FROM ab
""",
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of document length between two
    hash cohorts (doc_id parity — the A/B-split shape every curation
    experiment uses) per language, with the Welch–Satterthwaite degrees
    of freedom. The reference computes no statistics (main.py stops at
    CSV export); this is the experiment-readout primitive a corpus
    intervention (new filter, new source) is judged with.

    Shape: ONE map-side-combined groupBy collapses the corpus to
    (lang × 2) integer moment rows (n, Σx, Σx²) — exact BIGINT
    arithmetic survives any row count since n_chars is bounded; the
    self-join and every double expression run on that ≤12-row frame.
    Determinism: mean/variance/t/df are single expressions with
    identical parenthesization on both engines (each IEEE op correctly
    rounded), published at 6 dp."""
    m = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", (F.col("doc_id") % 2).alias("cohort"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("s"),
            F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("ss"),
        )
    )
    a = m.filter(F.col("cohort") == 0).select(
        "lang", F.col("n").alias("n_a"), F.col("s").alias("s_a"),
        F.col("ss").alias("ss_a"),
    )
    b = m.filter(F.col("cohort") == 1).select(
        "lang", F.col("n").alias("n_b"), F.col("s").alias("s_b"),
        F.col("ss").alias("ss_b"),
    )
    j = a.join(b, "lang")
    mean_a = F.col("s_a").cast("double") / F.col("n_a")
    mean_b = F.col("s_b").cast("double") / F.col("n_b")
    var_a = (
        F.col("ss_a").cast("double")
        - (F.col("s_a").cast("double") * F.col("s_a")) / F.col("n_a")
    ) / (F.col("n_a") - 1)
    var_b = (
        F.col("ss_b").cast("double")
        - (F.col("s_b").cast("double") * F.col("s_b")) / F.col("n_b")
    ) / (F.col("n_b") - 1)
    se2_a = var_a / F.col("n_a")
    se2_b = var_b / F.col("n_b")
    return j.select(
        "lang",
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round((mean_a - mean_b) / F.sqrt(se2_a + se2_b), 6).alias("t_stat"),
        F.round(
            ((se2_a + se2_b) * (se2_a + se2_b))
            / (
                se2_a * se2_a / (F.col("n_a") - 1)
                + se2_b * se2_b / (F.col("n_b") - 1)
            ),
            6,
        ).alias("df_welch"),
    )


@query(
    "stats_linreg_by_group",
    oracle="""
WITH pts AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(value AS DECIMAL(12,2)) AS y
  FROM events
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(CAST(x AS BIGINT) * x) AS BIGINT) AS sxx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM pts GROUP BY event_type
)
SELECT event_type, n,
       ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
         AS slope,
       ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                   * sx) / n, 6) AS intercept,
       ROUND(((CAST(n AS DOUBLE) * sxy - sx * sy)
              * (CAST(n AS DOUBLE) * sxy - sx * sy))
             / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r2
FROM m
""",
)
def stats_linreg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment ordinary-least-squares trend: slope, intercept, and
    R² of event value against time (epoch day) for every event type —
    the drift detector behind "is this metric trending" monitoring
    panels, and the per-group regression shape Spark's ML layer is
    overkill for.

    Shape: ONE map-side-combined groupBy collapses each group to its
    five exact moments (integer x sums in BIGINT, y sums in exact
    DECIMAL — order-independent at any volume); every double division
    happens on the ≤5-row moments frame with identical
    parenthesization on both engines, published at 6 dp."""
    pts = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("x"),
        F.col("value").cast("decimal(12,2)").alias("y"),
    )
    m = pts.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x").cast("long") * F.col("x")).cast("long").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    # n·sxx exceeds BIGINT near 10M rows/group (x ≈ epoch-day 2e4 ⇒
    # sxx ≈ 8e14; ×n overflows 2^63) — promote to double BEFORE the
    # product, identically on both engines, so the decade run survives
    num = F.col("n").cast("double") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    slope = num / den
    return m.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(
            (num * num)
            / (den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            6,
        ).alias("r2"),
    )


@query(
    "stats_psi_drift",
    oracle="""
WITH ev AS (
  SELECT event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM events
),
mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev),
halved AS (
  SELECT event_type, v,
         CASE WHEN us < mid.mid THEN 'p' ELSE 'q' END AS half
  FROM ev, mid
),
fb AS (
  SELECT event_type, MIN(v) AS lo, MAX(v) AS hi
  FROM halved WHERE half = 'p' GROUP BY event_type
),
bucketed AS (
  SELECT h.event_type, h.half,
         CASE WHEN fb.hi = fb.lo THEN 0
              ELSE LEAST(9, GREATEST(0, CAST(FLOOR(
                ((CAST(h.v AS DOUBLE) - CAST(fb.lo AS DOUBLE)) * 10.0)
                / (CAST(fb.hi AS DOUBLE) - CAST(fb.lo AS DOUBLE))
              ) AS BIGINT))) END AS bucket
  FROM halved h JOIN fb ON h.event_type = fb.event_type
),
counts AS (
  SELECT event_type, half, bucket, COUNT(*) AS cnt
  FROM bucketed GROUP BY 1, 2, 3
),
totals AS (
  SELECT event_type,
         SUM(CASE WHEN half = 'p' THEN cnt ELSE 0 END) AS n_p,
         SUM(CASE WHEN half = 'q' THEN cnt ELSE 0 END) AS n_q
  FROM counts GROUP BY event_type
  HAVING SUM(CASE WHEN half = 'p' THEN cnt ELSE 0 END) > 0
     AND SUM(CASE WHEN half = 'q' THEN cnt ELSE 0 END) > 0
),
domain AS (
  SELECT fb.event_type, r.range AS bucket FROM fb, range(0, 10) r
),
cells AS (
  SELECT d.event_type, d.bucket,
         GREATEST(CAST(COALESCE(cp.cnt, 0) AS DOUBLE) / t.n_p, 1e-6) AS p,
         GREATEST(CAST(COALESCE(cq.cnt, 0) AS DOUBLE) / t.n_q, 1e-6) AS q,
         t.n_p, t.n_q
  FROM domain d
  JOIN totals t ON d.event_type = t.event_type
  LEFT JOIN counts cp ON cp.event_type = d.event_type
       AND cp.bucket = d.bucket AND cp.half = 'p'
  LEFT JOIN counts cq ON cq.event_type = d.event_type
       AND cq.bucket = d.bucket AND cq.half = 'q'
)
SELECT event_type, CAST(n_p AS BIGINT) AS n_first, CAST(n_q AS BIGINT) AS n_second,
       round(CAST(SUM(CAST((p - q) * ln(p / q) AS DECIMAL(38,18)))
                  AS DOUBLE), 6) AS psi
FROM cells GROUP BY event_type, n_p, n_q
""",
)
def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second time
    halves of each event type's value distribution — the standard
    model-monitoring drift score (PSI < 0.1 stable, > 0.25 shifted).
    Complements stats_ks_source (distribution vs distribution across
    sources) and events_cusum_drift (sequential mean shift) with the
    binned-share drift the feature-store dashboards actually plot.

    Shape: the time midpoint is one bounded min/max aggregate
    (broadcast back — no collect); first-half per-type bounds are a
    5-row frame, broadcast; bucketing is a pure projection; then ONE
    combiner-bounded groupBy to (type, half, bucket) cells — at most
    |types| x 2 x 10 rows cross any shuffle, regardless of input
    volume. Missing buckets are restored from an explicit
    types x range(10) domain (both engines build the same domain) and
    floored at 1e-6 per the standard PSI zero-cell convention; a type
    whose events all fall in one half has no drift to score and is
    dropped in both engines (its empty-half share is 0/0 — Spark NULL
    vs DuckDB inf, ADVICE r9). All
    double expressions share one parenthesization with the oracle;
    the 10-term PSI sum goes through DECIMAL(38,18).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    # integer floor-div: the micros sum exceeds 2^53, so a double /2
    # would round where DuckDB's // floors — `div` stays in BIGINT
    mid = ev.groupBy().agg(F.min("us").alias("mn"), F.max("us").alias("mx")).select(
        F.expr("mn div 2 + mx div 2 + (mn % 2) * (mx % 2)").alias("mid")
    )
    # OPTIMIZATION r13 (guide §2.4): halved feeds fb, bucketed AND (via
    # counts) three broadcast legs — unmaterialized, Catalyst expanded
    # the events scan ~9x (plan showed 14 scans). One tracked columnar
    # persist computes it once; `counts` (≤ |types|×2×10 rows) is
    # eagerly checkpointed below so its three consumers read a tiny
    # RDD instead of three rebuilds.
    from data_collection_ieee_spark.catalog import persist_tracked

    halved = persist_tracked(
        ev.crossJoin(F.broadcast(mid)).select(
            "event_type",
            "v",
            F.when(F.col("us") < F.col("mid"), F.lit("p"))
            .otherwise(F.lit("q"))
            .alias("half"),
        )
    )
    fb = (
        halved.filter(F.col("half") == "p")
        .groupBy("event_type")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    )
    vd = F.col("v").cast("double")
    lod = F.col("lo").cast("double")
    hid = F.col("hi").cast("double")
    bucketed = halved.join(F.broadcast(fb), "event_type").select(
        "event_type",
        "half",
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.lit(9).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(((vd - lod) * F.lit(10.0)) / (hid - lod)),
                ),
            )
        )
        .alias("bucket"),
    )
    # ≤ |types|×2×10 rows, consumed 3x. LAZY (ADVICE r13): an eager
    # checkpoint here executed Spark jobs at DataFrame-CONSTRUCTION
    # time (merely building the plan — explain, plan capture — launched
    # work); lazy materializes once at the caller's action and the
    # blocks are shared by all three consumers exactly the same way.
    counts = (
        bucketed.groupBy("event_type", "half", "bucket")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    from data_collection_ieee_spark.catalog import (
        track_final_checkpoint as _track_final_checkpoint,
    )

    _track_final_checkpoint(counts)  # release_caches() drops the blocks
    # a type with all its mass in one half has no drift to score and
    # its empty-half share would divide by zero (Spark NULL vs DuckDB
    # inf — engine-divergent): drop it in both engines (ADVICE r9)
    totals = counts.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == "p", F.col("cnt")).otherwise(0)).alias("n_p"),
        F.sum(F.when(F.col("half") == "q", F.col("cnt")).otherwise(0)).alias("n_q"),
    ).filter((F.col("n_p") > 0) & (F.col("n_q") > 0))
    domain = fb.select("event_type").crossJoin(
        spark.range(10).select(F.col("id").alias("bucket"))
    )
    cp = counts.filter(F.col("half") == "p").select(
        "event_type", "bucket", F.col("cnt").alias("cnt_p")
    )
    cq = counts.filter(F.col("half") == "q").select(
        "event_type", "bucket", F.col("cnt").alias("cnt_q")
    )
    cells = (
        domain.join(F.broadcast(totals), "event_type")
        .join(F.broadcast(cp), ["event_type", "bucket"], "left")
        .join(F.broadcast(cq), ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "n_p",
            "n_q",
            F.greatest(
                F.coalesce(F.col("cnt_p"), F.lit(0)).cast("double") / F.col("n_p"),
                F.lit(1e-6),
            ).alias("p"),
            F.greatest(
                F.coalesce(F.col("cnt_q"), F.lit(0)).cast("double") / F.col("n_q"),
                F.lit(1e-6),
            ).alias("q"),
        )
    )
    term = ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).cast(
        "decimal(38,18)"
    )
    return cells.groupBy("event_type", "n_p", "n_q").agg(
        F.round(F.sum(term).cast("double"), 6).alias("psi")
    ).select(
        "event_type",
        F.col("n_p").cast("long").alias("n_first"),
        F.col("n_q").cast("long").alias("n_second"),
        "psi",
    )


@query(
    "stats_benford_digits",
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                               AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice > 0
),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
t AS (SELECT SUM(n) AS total FROM c)
SELECT c.digit, c.n,
       round(CAST(c.n AS DOUBLE) / t.total, 6) AS share,
       round(ln(1.0 + 1.0 / c.digit) / ln(10.0), 6) AS benford,
       round(CAST(c.n AS DOUBLE) / t.total
             - ln(1.0 + 1.0 / c.digit) / ln(10.0), 6) AS deviation
FROM c, t
""",
)
def stats_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against
    Benford's law — the classic forensic-accounting / data-quality
    audit (synthetic or tampered money columns drift from the
    log-uniform digit law; honest multiplicative processes follow it).

    ONE combiner-bounded groupBy to ≤9 digit cells at any volume; the
    total re-aggregates those cells (no second scan). The first digit
    is the leading character of the exact integer CENTS (DECIMAL(12,2)
    × 100 → BIGINT — positive cents ≥ 1 never has a leading zero, and
    the 0.99-style leading-zero case collapses away with the decimal
    point) — no regexp in the per-row path (a regexp scan measured
    ~2× the substr form per decade), and no log10/floor extraction,
    whose behavior at exact powers of ten is an engine-specific ULP
    coin flip. Expected shares are single ln expressions with one
    parenthesization on both engines.
    """
    d = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100)
                .cast("bigint")
                .cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n"))
    t = c.groupBy().agg(F.sum("n").alias("total"))
    benford = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
    share = F.col("n").cast("double") / F.col("total")
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(share, 6).alias("share"),
        F.round(benford, 6).alias("benford"),
        F.round(share - benford, 6).alias("deviation"),
    )

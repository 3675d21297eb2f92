"""Training-data pipeline operators — corpus curation at 100 TB.

The reference stops at raw record extraction (reference main.py:187-199
writes whatever was scraped); a production training-data pipeline then
has to curate: sample per-language mixes, gate on quality signals,
profile length distributions, balance domains, and pack documents into
fixed-size training sequences. Each of those is a `queries()` entry
here, built from codegen-friendly expressions only.

Determinism rules (so the DuckDB oracle hashes match bit-for-bit):
- sampling decisions come from an md5-derived 60-bit integer of the
  doc_id — a cross-engine deterministic "random" — never from rand();
- ratios are integer counts divided once at the end and rounded;
- packing uses integer running sums over an explicit (source, doc_id)
  order.

Scale notes:
- `sample_stratified` is a pure narrow filter — no shuffle, pushes to
  the scan; rates are swappable per stratum without reshuffling.
- `pipeline_quality_filter` is one narrow projection; at 100 TB this
  is the map stage in front of every other curation pass.
- `text_token_histogram` / `mix_domain_ratios` are single map-side-
  combined aggregations over tiny key spaces.
- `pack_sequences` does its running sum per `source` partition (a
  window over (source, doc_id)) — streams, not global sorts; a 1000-
  executor cluster packs all sources in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table
from data_collection_ieee_spark.registry import query

# Cross-engine deterministic 60-bit hash of doc_id, reduced mod 100.
# Spark and DuckDB md5 hex strings are identical; both take the first
# 15 hex chars (60 bits, fits BIGINT) and the value is non-negative,
# so % 100 agrees.
_SPARK_DOC_BUCKET = (
    "cast(conv(substring(md5(cast(cast(doc_id as string) as binary)), 1, 15), 16, 10) as bigint) % 100"
)
_SQL_DOC_BUCKET = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100"

# Per-language keep-rates (percent) for the training mix: downsample
# the dominant language, keep the tail languages whole.
_RATES = {"en": 40, "fr": 80, "de": 80, "es": 80, "zh": 100}
_DEFAULT_RATE = 100
_SPARK_RATE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _RATES.items())
    + f" ELSE {_DEFAULT_RATE} END"
)


@query(
    "sample_stratified",
    oracle=f"""
SELECT doc_id, lang, source,
       CAST({_SQL_DOC_BUCKET} AS BIGINT) AS bucket
FROM documents
WHERE {_SQL_DOC_BUCKET} < ({_SPARK_RATE})
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sampling: keep a doc iff
    its md5-bucket (0-99) falls under its language's rate. A pure
    narrow filter — no shuffle, no rand(), rerunnable byte-identically
    on any cluster layout; changing the mix is a literal edit."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_DOC_BUCKET)
    return docs.select(
        "doc_id", "lang", "source", bucket.cast("long").alias("bucket")
    ).filter(bucket < F.expr(_SPARK_RATE))


_MIN_TOKENS = 20
_MAX_TOKENS = 1000
_MAX_STOP_PCT = 30  # % of tokens allowed to be stopwords
_STOPWORDS = ("the", "a", "of", "and", "to")
_SQL_STOPLIST = "['" + "', '".join(_STOPWORDS) + "']"


@query(
    "pipeline_quality_filter",
    oracle=f"""
WITH sig AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '), t -> list_contains({_SQL_STOPLIST}, t))) AS BIGINT)
           AS n_stop
  FROM documents
)
SELECT doc_id, n_tokens, n_stop,
       CASE
         WHEN n_tokens < {_MIN_TOKENS} THEN 'too_short'
         WHEN n_tokens > {_MAX_TOKENS} THEN 'too_long'
         WHEN 100 * n_stop > {_MAX_STOP_PCT} * n_tokens THEN 'stopword_heavy'
         ELSE 'keep'
       END AS verdict
FROM sig
""",
)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate in front of training ingestion: token count bounds
    and stopword-density cap, each doc tagged keep/why-dropped. The
    threshold test is integer arithmetic (100*n_stop > 30*n_tokens) so
    no ratio rounding can disagree with the oracle. One narrow pass."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    sig = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(
            F.filter(toks, lambda t: F.array_contains(stop_arr, t))
        ).cast("long").alias("n_stop"),
    )
    return sig.select(
        "doc_id",
        "n_tokens",
        "n_stop",
        F.when(F.col("n_tokens") < _MIN_TOKENS, F.lit("too_short"))
        .when(F.col("n_tokens") > _MAX_TOKENS, F.lit("too_long"))
        .when(100 * F.col("n_stop") > _MAX_STOP_PCT * F.col("n_tokens"), F.lit("stopword_heavy"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
    )


_HIST_BIN = 32


@query(
    "text_token_histogram",
    oracle=f"""
WITH t AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents
),
b AS (
  SELECT (n_tokens // {_HIST_BIN}) * {_HIST_BIN} AS bin_lo, n_tokens FROM t
),
n AS (SELECT COUNT(*) AS total FROM t)
SELECT CAST(bin_lo AS BIGINT) AS bin_lo,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       round(CAST(COUNT(*) AS DOUBLE) / MAX(n.total), 6) AS doc_share
FROM b, n
GROUP BY bin_lo
""",
)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (fixed 32-token bins) with corpus share —
    the length profile that drives packing/context-length decisions.
    Integer bin edges (floor division), one map-side-combined agg.

    The corpus total is Σ n_docs over the histogram itself (every doc
    lands in exactly one bin), so the share comes from a window over
    the ≤|bins| aggregated rows — no second scan, no 1-row crossJoin."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    binned = docs.select(
        (F.floor(n_tokens / _HIST_BIN).cast("long") * _HIST_BIN).alias("bin_lo"),
        n_tokens.alias("n_tokens"),
    )
    return (
        binned.groupBy("bin_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .withColumn(
            "doc_share",
            F.round(F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy()), 6),
        )
    )


@query(
    "mix_domain_ratios",
    oracle="""
WITH g AS (
  SELECT source, lang,
         COUNT(*) AS n_docs,
         CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS sum_tokens
  FROM documents GROUP BY source, lang
)
SELECT source, lang, n_docs, sum_tokens,
       round(CAST(sum_tokens AS DOUBLE) / SUM(sum_tokens) OVER (), 6) AS token_share,
       round(CAST(sum_tokens AS DOUBLE) / SUM(sum_tokens) OVER (PARTITION BY lang), 6)
         AS share_within_lang
FROM g
""",
)
def mix_domain_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language mixing table: per (source, lang) doc and token
    totals plus each cell's share of the corpus and of its language —
    the numbers a data-mix rebalancer consumes. Aggregation first (the
    heavy shuffle, map-side combined), window shares over the tiny
    aggregated frame."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("sum_tokens"),
    )
    w_all = Window.partitionBy()
    w_lang = Window.partitionBy("lang")
    return g.select(
        "source",
        "lang",
        "n_docs",
        "sum_tokens",
        F.round(F.col("sum_tokens") / F.sum("sum_tokens").over(w_all), 6).alias("token_share"),
        F.round(F.col("sum_tokens") / F.sum("sum_tokens").over(w_lang), 6).alias(
            "share_within_lang"
        ),
    )


_CTX_LEN = 2048


@query(
    "pack_sequences",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT source,
       CAST((cum - n_tokens) // {_CTX_LEN} AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY source, pack_id
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: stream each source's docs in doc_id
    order, cut a new pack every 2048 cumulative tokens (a doc
    joins the pack its START offset falls in). Emits per-pack doc
    count, token fill and doc-id range. The running sum is windowed
    PER SOURCE — independent streams, so the packing parallelizes
    across sources/partitions instead of forcing one global sort."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.select(
            "source",
            F.floor((F.col("cum") - F.col("n_tokens")) / _CTX_LEN).cast("long").alias("pack_id"),
            "doc_id",
            "n_tokens",
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


_DECON_NGRAM = 8  # word n-gram width for eval-overlap matching
_DECON_EVAL_PCT = 5  # md5-bucket share of the corpus held out as "eval"


@query(
    "pipeline_decontaminate",
    oracle=f"""
WITH lists AS (
  SELECT doc_id, {_SQL_DOC_BUCKET} AS bucket,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - {_DECON_NGRAM - 2}),
             i -> array_to_string(list_slice(string_split(text,' '), i, i+{_DECON_NGRAM - 1}), ' ')))
           AS ngs
  FROM documents
  WHERE len(string_split(text,' ')) >= {_DECON_NGRAM}
),
ng AS (
  SELECT doc_id, bucket, len(ngs) AS n_doc_ngrams, unnest(ngs) AS ngram FROM lists
),
ev AS (SELECT DISTINCT ngram FROM ng WHERE bucket < {_DECON_EVAL_PCT}),
tr AS (SELECT doc_id, n_doc_ngrams, ngram FROM ng WHERE bucket >= {_DECON_EVAL_PCT})
SELECT tr.doc_id,
       CAST(MAX(tr.n_doc_ngrams) AS BIGINT) AS n_doc_ngrams,
       COUNT(*) AS n_shared_ngrams
FROM tr JOIN ev USING (ngram)
GROUP BY tr.doc_id
""",
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination — the step every training-data pipeline
    runs before a model ever sees the corpus: flag training documents
    that share any word 8-gram with the held-out eval set
    (here the deterministic md5-bucket < 5% slice of `documents`
    stands in for the benchmark suite). Emits each contaminated doc
    with its distinct-n-gram total and how many of them hit the eval
    set, so the caller can drop or down-weight by overlap fraction.

    Scale shape: n-grams are built and deduped IN-ROW and never
    materialized as strings — each token is xxhash64'd once, an
    8-gram's identity is xxhash64 of its eight token hashes (the
    `_shingles_df` device from dedup.py:92-104: same distinct-set
    semantics as string n-grams up to a ~2⁻⁶⁴ collision, at a
    fraction of the concat/allocation cost — measured 4.5× the
    string-building variant at sf0.1, which also trips a slow fused
    explode-over-transform codegen path). The eval n-gram set is tiny
    by definition (a benchmark suite is MBs even when the corpus is
    100 TB) and rides a broadcast hash join of 8-byte keys, so the
    only shuffle is the final groupBy over the already-filtered
    contaminated subset."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    args8 = ", ".join(f"element_at(th, i + {j})" for j in range(_DECON_NGRAM))
    hs = F.expr(
        f"""
        element_at(transform(array(transform(split(text, ' '), t -> xxhash64(t))),
          th -> array_distinct(transform(
            sequence(1, size(th) - {_DECON_NGRAM - 1}),
            i -> xxhash64({args8})))
        ), 1)
        """
    )
    base = docs.filter(F.size(toks) >= _DECON_NGRAM).select(
        "doc_id", F.expr(_SPARK_DOC_BUCKET).alias("bucket"), hs.alias("hs")
    )
    ev = (
        base.filter(F.col("bucket") < _DECON_EVAL_PCT)
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    tr = base.filter(F.col("bucket") >= _DECON_EVAL_PCT).select(
        "doc_id",
        F.size("hs").cast("long").alias("n_doc_ngrams"),
        F.explode("hs").alias("h"),
    )
    return (
        tr.join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(
            F.max("n_doc_ngrams").alias("n_doc_ngrams"),
            F.count("*").alias("n_shared_ngrams"),
        )
    )


@query(
    "pipeline_curate_corpus",
    oracle=f"""
WITH deduped AS (
  SELECT doc_id, lang, source, text,
         ROW_NUMBER() OVER (PARTITION BY md5(lower(text)) ORDER BY doc_id) AS copy_rank
  FROM documents
),
kept AS (
  SELECT doc_id, lang, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM deduped
  WHERE copy_rank = 1
    AND len(string_split(text, ' ')) BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}
    AND {_SQL_DOC_BUCKET} < ({_SPARK_RATE})
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM kept
GROUP BY lang, source
""",
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as ONE composed query — what a
    training-data run actually executes: exact dedup (keep the lowest
    doc_id per content hash) → token-length quality gate → per-language
    stratified sample → per-(lang, source) corpus manifest. Composition
    is the point: each stage is the already-verified operator logic,
    fused by Catalyst into window + filter + aggregate with the narrow
    stages pipelined — no materialization between steps. At 100 TB
    this one plan replaces a 4-job orchestration with its 3
    intermediate tables."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    copy_rank = F.row_number().over(
        W.partitionBy(F.md5(F.lower("text").cast("binary"))).orderBy("doc_id")
    )
    n_tokens = F.size(F.split("text", " ")).cast("long")
    kept = (
        docs.withColumn("copy_rank", copy_rank)
        .filter(F.col("copy_rank") == 1)
        .withColumn("n_tokens", n_tokens)
        .filter(F.col("n_tokens").between(_MIN_TOKENS, _MAX_TOKENS))
        .filter(F.expr(_SPARK_DOC_BUCKET) < F.expr(_SPARK_RATE))
    )
    return kept.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


_Q_BITS_MAX = 127  # symmetric int8 range


@query(
    "embed_quantize_int8",
    oracle=f"""
WITH scaled AS (
  SELECT vec_id,
         round(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                       x -> abs(x))) / {_Q_BITS_MAX}, 6) + 0.0 AS qscale,
         CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings
)
SELECT vec_id, qscale,
       CASE WHEN qscale = 0.0
            THEN list_transform(e, x -> 0)
            ELSE list_transform(e, x -> CAST(greatest(-{_Q_BITS_MAX},
                   least({_Q_BITS_MAX}, round(x / qscale, 0))) AS INT))
       END AS codes,
       CASE WHEN qscale = 0.0 THEN 0
            ELSE CAST(len(list_filter(e,
                   x -> abs(round(x / qscale, 0)) > {_Q_BITS_MAX})) AS INT)
       END AS n_clipped
FROM scaled
""",
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    storage-side step of an embedding pipeline at 100 TB (float32
    vectors quantize 4× smaller for ANN index shipping and cold
    storage; search kernels dequantize per block). Per vector:
    scale = max|x| / 127 (ROUNDED to 6 decimals so both engines
    quantize with the IDENTICAL scalar — the rounding is part of the
    codec, not display), codes = round(x / scale) clamped to ±127
    (clamping is reachable because the rounded-down scale can push the
    max element to 127.5…; n_clipped counts those lanes), zero-vectors
    map to all-zero codes by the scale-0 guard.

    Everything is one narrow in-row projection — higher-order
    transforms over the array, no shuffle, no Python — so the operator
    is a pure map at any corpus size. Cross-engine determinism: double
    arithmetic in identical order, round-half-away on both engines,
    and an exact `qscale = 0.0` guard; the reconstruction-error bound
    (≤ scale/2 per lane, unclipped) is property-tested in pytest."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    qscale = F.round(
        F.array_max(F.transform(e, lambda x: F.abs(x))) / _Q_BITS_MAX, 6
    ) + F.lit(0.0)
    with_scale = emb.select("vec_id", e.alias("e"), qscale.alias("qscale"))
    code = lambda x: F.greatest(  # noqa: E731
        F.lit(-_Q_BITS_MAX),
        F.least(F.lit(_Q_BITS_MAX), F.round(x / F.col("qscale"), 0)),
    ).cast("int")
    return with_scale.select(
        "vec_id",
        "qscale",
        F.when(
            F.col("qscale") == 0.0,
            F.transform(F.col("e"), lambda x: F.lit(0)),
        )
        .otherwise(F.transform(F.col("e"), code))
        .alias("codes"),
        F.when(F.col("qscale") == 0.0, F.lit(0))
        .otherwise(
            F.size(
                F.filter(
                    F.col("e"),
                    lambda x: F.abs(F.round(x / F.col("qscale"), 0)) > _Q_BITS_MAX,
                )
            )
        )
        .cast("int")
        .alias("n_clipped"),
    )


_MIX_ALPHA = 0.7  # temperature exponent: w_i ∝ (tokens_i)^α
_MIX_BUDGET = 1_000_000_000  # notional training budget, tokens


@query(
    "mix_temperature_resample",
    oracle=f"""
WITH g AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(CAST(len(string_split(text,' ')) AS BIGINT)) AS BIGINT) AS sum_tokens
  FROM documents GROUP BY source
),
t AS (
  SELECT *, CAST(round(pow(CAST(sum_tokens AS DOUBLE), {_MIX_ALPHA}), 6)
                 AS DECIMAL(30,6)) AS term
  FROM g
),
w AS (
  SELECT source, n_docs, sum_tokens,
         round(CAST(sum_tokens AS DOUBLE) / SUM(sum_tokens) OVER (), 6) AS token_share,
         round(CAST(term AS DOUBLE) / CAST(SUM(term) OVER () AS DOUBLE), 6) AS weight
  FROM t
)
SELECT source, n_docs, sum_tokens, token_share, weight,
       CAST(round({_MIX_BUDGET} * weight, 0) AS BIGINT) AS target_tokens,
       round(CAST(CAST(round({_MIX_BUDGET} * weight, 0) AS BIGINT) AS DOUBLE)
             / sum_tokens, 4) AS epochs
FROM w
""",
)
def mix_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multinomial-sampling step
    of multilingual/multi-domain LLM training à la mBERT/XLM-R and
    Pile-style mixes): per source, natural token share p_i and the
    α = 0.7 temperature weight w_i = tokens_i^α / Σ tokens_j^α — the
    exponent flattens the head so low-resource sources are upsampled —
    plus the resulting token allocation of a notional 1B-token budget
    and the epochs over each source that allocation implies (epochs > 1
    = the source will repeat).

    Determinism: the Σ tokens_j^α normalizer is a float sum, so each
    pow() term is rounded to 6 dp and cast DECIMAL(30,6) before the
    exact decimal sum (registry decimal-sum convention); pow/ln stay
    out of every threshold. target/epochs derive from the ROUNDED
    weight so every downstream column is a pure function of published
    columns.

    Plan: one map-side-combined groupBy(source) — the only shuffle,
    output rows = |sources| — then unpartitioned window sums over that
    tiny aggregated frame (same shape as `mix_domain_ratios`; a global
    window over a post-agg frame of dimension cardinality is the
    correct 100 TB pattern, not a scale hazard)."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("sum_tokens"),
    )
    t = g.withColumn(
        "term",
        F.round(F.pow(F.col("sum_tokens").cast("double"), F.lit(_MIX_ALPHA)), 6).cast(
            "decimal(30,6)"
        ),
    )
    w_all = Window.partitionBy()
    w = t.select(
        "source",
        "n_docs",
        "sum_tokens",
        F.round(
            F.col("sum_tokens").cast("double") / F.sum("sum_tokens").over(w_all), 6
        ).alias("token_share"),
        F.round(
            F.col("term").cast("double") / F.sum("term").over(w_all).cast("double"), 6
        ).alias("weight"),
    )
    target = F.round(F.lit(_MIX_BUDGET) * F.col("weight"), 0).cast("long")
    return w.select(
        "*",
        target.alias("target_tokens"),
        F.round(target.cast("double") / F.col("sum_tokens"), 4).alias("epochs"),
    )


# hash-prefix buckets bounding any one pack window task: ordering by
# (bucket, h, doc_id) == (h, doc_id) because the bucket is a prefix of h
_PACK_BUCKETS = 256


def _token_budget_pack_oracle() -> str:
    """Composed from `mix_temperature_resample`'s registered SQL (the
    dedup-manifest precedent) so the per-source targets can never drift
    from the weights operator this query consumes."""
    from data_collection_ieee_spark.registry import ORACLES

    return f"""
WITH mt AS ({ORACLES["mix_temperature_resample"]}),
t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT c.doc_id, c.source, c.n_tokens,
       CAST(c.cum_tokens AS BIGINT) AS cum_tokens,
       mt.target_tokens
FROM c JOIN mt ON c.source = mt.source
WHERE c.cum_tokens - c.n_tokens < mt.target_tokens
"""


@query("mix_token_budget_pack", oracle=_token_budget_pack_oracle)
def mix_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget keep-list (VERDICT r12 #9) — the
    CONSUMER of `mix_temperature_resample`'s weights: given each
    source's target token allocation, emit the documents that fill it.
    Documents are admitted in md5(doc_id) order — the repo's standard
    coordination-free deterministic shuffle (same family as
    `sample_hash_split`), reproducible across runs, engines, and
    cluster sizes, and stable under corpus growth — until the source's
    budget is covered; the document that crosses the boundary is kept
    (minimal covering prefix), and a source whose target exceeds its
    supply (epochs > 1) keeps everything and repeats at training time.

    Scale shape: the per-source running token sum is the one hazard —
    PARTITION BY source puts a whole source (possibly 1/10th of the
    corpus) in one window task. The bucketed-offset device (the
    `agg_weighted_percentiles` family): docs hash into `_PACK_BUCKETS`
    prefix-ordered buckets, per-(source,bucket) token sums prefix-sum
    on a |sources|x256 frame, and each doc's global cumulative = its
    bucket offset + a within-(source,bucket) window — every sort task
    bounded at ~1/256th of a source. Targets ride a broadcast of the
    |sources|-row `mix_temperature_resample` output (invoked directly,
    so query and oracle consume the SAME weights by construction)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
    )
    docs = docs.withColumn(
        "b",
        F.expr("cast(conv(substring(h, 1, 2), 16, 10) as int)"),
    )
    per_bucket = docs.groupBy("source", "b").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    w_src = (
        Window.partitionBy("source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = per_bucket.select(
        "source",
        "b",
        (F.sum("bucket_tokens").over(w_src) - F.col("bucket_tokens")).alias(
            "offset_tokens"
        ),
    )
    targets = mix_temperature_resample(spark, sf_dir).select(
        "source", "target_tokens"
    )
    w_in = (
        Window.partitionBy("source", "b")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        docs.withColumn("cum_in_bucket", F.sum("n_tokens").over(w_in))
        .join(F.broadcast(offsets), ["source", "b"])
        .join(F.broadcast(targets), "source")
        .withColumn(
            "cum_tokens", F.col("offset_tokens") + F.col("cum_in_bucket")
        )
    )
    return cum.filter(
        F.col("cum_tokens") - F.col("n_tokens") < F.col("target_tokens")
    ).select("doc_id", "source", "n_tokens", "cum_tokens", "target_tokens")


def _scorecard_oracle() -> str:
    """Compose the constituents' registered oracle SQL as CTEs — the
    scorecard's oracle can never drift from the operators it joins.
    Passed to @query as a CALLABLE: the registry resolves it at the end
    of load_all(), after every module has registered, so there is no
    import-order coupling between operator modules."""
    from data_collection_ieee_spark.registry import ORACLES

    return f"""
WITH q AS ({ORACLES["pipeline_quality_filter"]}),
r AS ({ORACLES["text_repetition_signals"]}),
t AS ({ORACLES["text_token_rarity"]}),
lg AS ({ORACLES["text_lang_id"]})
SELECT q.doc_id, lg.pred_lang, q.n_tokens,
       q.verdict AS quality_verdict,
       r.verdict AS repetition_verdict,
       t.verdict AS rarity_verdict,
       CASE WHEN q.verdict <> 'keep' THEN q.verdict
            WHEN r.verdict <> 'keep' THEN r.verdict
            WHEN t.verdict <> 'keep' THEN t.verdict
            ELSE 'keep' END AS final_verdict
FROM q
JOIN r ON q.doc_id = r.doc_id
JOIN t ON q.doc_id = t.doc_id
JOIN lg ON q.doc_id = lg.doc_id
"""


@query(
    "pipeline_doc_scorecard",
    oracle=_scorecard_oracle,
)
def pipeline_doc_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation labels table: every verdict-bearing signal
    of the quality ladder joined into one row per doc — predicted
    language, the quality-gate / repetition / token-rarity verdicts,
    and a precedence-resolved final_verdict (quality > repetition >
    rarity; first non-keep wins). This is the frame a campaign
    MATERIALIZES once and every downstream job (sampling, mixing,
    reporting) reads — the complement of `pipeline_curate_corpus`,
    which fuses the decisions straight into a manifest.

    Plan: each constituent is its already-verified operator frame; the
    scorecard adds three doc_id equi-joins, which AQE executes off one
    common doc_id exchange. No new shuffle class; all verdicts are
    integer-exact so the join introduces no float drift."""
    q = pipeline_quality_filter(spark, sf_dir).select(
        "doc_id",
        F.col("n_tokens").alias("n_tokens"),
        F.col("verdict").alias("quality_verdict"),
    )
    from data_collection_ieee_spark.operators.text_analysis import (
        text_lang_id,
        text_repetition_signals,
        text_token_rarity,
    )

    r = text_repetition_signals(spark, sf_dir).select(
        "doc_id", F.col("verdict").alias("repetition_verdict")
    )
    t = text_token_rarity(spark, sf_dir).select(
        "doc_id", F.col("verdict").alias("rarity_verdict")
    )
    lang = text_lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    final = (
        F.when(F.col("quality_verdict") != "keep", F.col("quality_verdict"))
        .when(F.col("repetition_verdict") != "keep", F.col("repetition_verdict"))
        .when(F.col("rarity_verdict") != "keep", F.col("rarity_verdict"))
        .otherwise(F.lit("keep"))
    )
    return (
        q.join(r, "doc_id")
        .join(t, "doc_id")
        .join(lang, "doc_id")
        .select(
            "doc_id",
            "pred_lang",
            "n_tokens",
            "quality_verdict",
            "repetition_verdict",
            "rarity_verdict",
            final.alias("final_verdict"),
        )
    )


# train/val/test boundaries on the 0-99 md5 bucket: [0,80) / [80,90) / [90,100)
_SPLIT_TRAIN_END = 80
_SPLIT_VAL_END = 90


@query(
    "sample_hash_split",
    oracle=f"""
WITH tagged AS (
  SELECT CASE WHEN ({_SQL_DOC_BUCKET}) < {_SPLIT_TRAIN_END} THEN 'train'
              WHEN ({_SQL_DOC_BUCKET}) < {_SPLIT_VAL_END} THEN 'val'
              ELSE 'test' END AS split,
         n_chars, lang
  FROM documents
),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tagged)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars,
       CAST(COUNT(DISTINCT lang) AS INT) AS n_langs,
       round(COUNT(*) / t.n, 6) AS share
FROM tagged CROSS JOIN tot t
GROUP BY split, t.n
""",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test holdout split - the assignment step
    every training corpus needs before anything touches an eval set.
    Membership is a pure function of doc_id (md5-bucket 0-99 against
    80/10/10 boundaries), so the split is reproducible across runs,
    engines, and cluster sizes, stable under corpus growth (an old
    document never changes split when new ones arrive), and requires
    NO coordination - no global sort, no rand() seed plumbing, no
    driver state. Plan: one narrow projection computes the bucket
    JVM-side, one map-side-combined groupBy(split) reduces the corpus
    to three rows, and the share denominator rides a broadcast of the
    1-row total. The same bucket device backs sample_stratified and
    pipeline_decontaminate, so holdout and decontamination slices are
    mutually consistent by construction."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.when(F.expr(_SPARK_DOC_BUCKET) < _SPLIT_TRAIN_END, "train")
        .when(F.expr(_SPARK_DOC_BUCKET) < _SPLIT_VAL_END, "val")
        .otherwise("test")
        .alias("split"),
        "n_chars",
        "lang",
    )
    tot = docs.agg(F.count("*").cast("double").alias("n"))
    return (
        docs.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).cast("long").alias("sum_chars"),
            F.countDistinct("lang").cast("int").alias("n_langs"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "split",
            "n_docs",
            "sum_chars",
            "n_langs",
            F.round(F.col("n_docs") / F.col("n"), 6).alias("share"),
        )
    )


@query(
    "pipeline_dataset_card",
    oracle="""
WITH per_doc AS (
  SELECT source, lang, CAST(n_chars AS BIGINT) AS n_chars,
         md5(lower(text)) AS content_key
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(COUNT(DISTINCT lang) AS INT) AS n_langs,
       CAST(COUNT(DISTINCT content_key) AS BIGINT) AS n_unique,
       round(1.0 - CAST(COUNT(DISTINCT content_key) AS DOUBLE) / COUNT(*), 6)
         AS dup_rate,
       round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS mean_chars
FROM per_doc
GROUP BY source
""",
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset-card summary — the composition table that
    fronts a training-corpus release: volume (docs, chars), language
    breadth, exact-duplicate rate (1 − distinct-content/docs, content
    keyed by md5 of the lowercased text — the same normalization as
    dedup_exact_key so the card's dup_rate and the dedup operator's
    removals reconcile), and mean document size. One narrow projection
    and ONE groupBy(source) carrying two exact distinct aggregates;
    Spark plans multi-distinct as a single expand + two-phase
    aggregate, map-side combined, so the corpus is scanned once and
    shuffled once on source. Result cardinality = |sources| at any
    data size."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.md5(F.lower("text").cast("binary")).alias("content_key"),
    )
    return docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.countDistinct("lang").cast("int").alias("n_langs"),
        F.countDistinct("content_key").cast("long").alias("n_unique"),
        F.round(
            1.0 - F.countDistinct("content_key").cast("double") / F.count("*"), 6
        ).alias("dup_rate"),
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias(
            "mean_chars"
        ),
    )


def _dedup_manifest_oracle() -> str:
    """Compose the dedup ladder's registered oracles as CTEs (the
    `pipeline_doc_scorecard` device): the manifest's oracle can never
    drift from the constituents it fuses."""
    from data_collection_ieee_spark.registry import ORACLES

    return f"""
WITH ek AS ({ORACLES["dedup_exact_key"]}),
nj AS ({ORACLES["dedup_ngram_jaccard"]}),
sk AS ({ORACLES["dedup_semantic_keep"]}),
keyed AS (SELECT doc_id, md5(lower(text)) AS content_key FROM documents),
exact AS (
  SELECT keyed.doc_id, ek.keeper_doc_id AS exact_keeper_id
  FROM keyed JOIN ek ON keyed.content_key = ek.content_key
),
near AS (SELECT b_id AS doc_id, MIN(a_id) AS near_dup_of FROM nj GROUP BY b_id)
SELECT e.doc_id,
       e.exact_keeper_id,
       near.near_dup_of,
       COALESCE(sk.action, 'keep') AS semantic_action,
       CASE WHEN e.doc_id <> e.exact_keeper_id THEN 'exact_dup'
            WHEN near.near_dup_of IS NOT NULL THEN 'near_dup'
            WHEN COALESCE(sk.action, 'keep') = 'drop' THEN 'semantic_dup'
            ELSE 'keep' END AS final_verdict
FROM exact e
LEFT JOIN near ON e.doc_id = near.doc_id
LEFT JOIN sk ON e.doc_id = sk.vec_id
"""


@query(
    "pipeline_dedup_manifest",
    oracle=_dedup_manifest_oracle,
)
def pipeline_dedup_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document dedup manifest: the whole ladder's verdicts fused
    into ONE row per doc — exact keeper (content-hash group argmin),
    smallest near-duplicate neighbor (trigram Jaccard ≥ 0.8), the
    SemDeDup semantic action for docs with an embedding — plus a
    precedence-resolved final_verdict (exact > near > semantic; the
    cheapest-to-prove reason wins). This is the frame a curation run
    MATERIALIZES once and anti-joins the corpus against, completing
    the dedup family the way `pipeline_curate_corpus` completed
    curation (VERDICT r11 #9b).

    Plan: every constituent is its already-verified operator frame
    (`dedup_exact_key` group table re-joined on the recomputed
    content key; `dedup_ngram_jaccard` pairs min-aggregated per b-side
    doc; `dedup_semantic_keep` left-joined on vec_id — docs without
    embeddings default to 'keep'). The fuse itself adds only doc_id
    equi-joins that AQE runs off one common exchange; all verdicts are
    string/integer-exact, so no float drift crosses the joins. The
    oracle is composed from the constituents' REGISTERED oracle SQL
    (`_dedup_manifest_oracle`), so Spark plan and oracle can only
    drift together."""
    from data_collection_ieee_spark.operators.dedup import (
        dedup_exact_key,
        dedup_ngram_jaccard,
        dedup_semantic_keep,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.lower("text").cast("binary")).alias("content_key")
    )
    exact = docs.join(
        dedup_exact_key(spark, sf_dir).select("content_key", "keeper_doc_id"),
        "content_key",
    ).select("doc_id", F.col("keeper_doc_id").alias("exact_keeper_id"))
    near = (
        dedup_ngram_jaccard(spark, sf_dir)
        .groupBy(F.col("b_id").alias("doc_id"))
        .agg(F.min("a_id").alias("near_dup_of"))
    )
    sem = dedup_semantic_keep(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("action").alias("sem_action")
    )
    fused = (
        exact.join(near, "doc_id", "left")
        .join(sem, "doc_id", "left")
        .withColumn("semantic_action", F.coalesce("sem_action", F.lit("keep")))
    )
    verdict = (
        F.when(F.col("doc_id") != F.col("exact_keeper_id"), F.lit("exact_dup"))
        .when(F.col("near_dup_of").isNotNull(), F.lit("near_dup"))
        .when(F.col("semantic_action") == "drop", F.lit("semantic_dup"))
        .otherwise(F.lit("keep"))
    )
    return fused.select(
        "doc_id",
        "exact_keeper_id",
        "near_dup_of",
        "semantic_action",
        verdict.alias("final_verdict"),
    )

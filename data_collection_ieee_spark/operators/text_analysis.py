"""Text-analysis operators over `documents` (north-star surface).

The reference's only text assets are abstracts/titles/keyword strings
(reference main.py:100-104); this module supplies the analysis layer a
training-data pipeline needs: tf-idf, corpus stats, language ID,
quality scoring, token counting, and content fingerprinting.

Everything is built-in JVM expressions (split/explode/regexp/md5 — no
Python), so each operator costs one or two map-side-combined shuffles
at any scale. Float outputs are single-expression arithmetic (identical
IEEE op order on both engines) plus rounding, so hashes can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table
from data_collection_ieee_spark.registry import query

# estimated serialized size above which tf-idf's df table stops being
# broadcast. Decided on BYTES, not row count (ADVICE r12): a sub-1M-row
# vocabulary of long junk tokens (URLs, concatenated noise from the
# whitespace split) can dwarf the 16-byte/row estimate a count-based
# gate assumes. 64 MB is comfortably inside driver and executor
# memory; past that the token keyspace is wide enough that the
# ordinary shuffle join has no per-key skew to fear.
_BROADCAST_VOCAB_MAX_BYTES = 64 * 1024 * 1024
# per-row fixed overhead on top of the token bytes: 8-byte count +
# UnsafeRow/offset bookkeeping
_VOCAB_ROW_OVERHEAD = 24

_STOPWORDS = ("the", "a", "of", "and", "to")
_SQL_STOP = "', '".join(_STOPWORDS)


@query(
    "text_wordcount_tfidf",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.token, tf.tf, df.df,
       round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
FROM tf JOIN df USING (token) CROSS JOIN n
""",
)
def text_wordcount_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL tf-idf: explode → (doc,term) counts → document
    frequencies → weight join. One shuffle for tf (doc+term), a
    broadcast of the vocabulary-sized df table and of the 1-row
    corpus count.

    The df join is the scale trap this query exists to demonstrate:
    joining the (doc,term) frame to df ON TOKEN shuffles hundreds of
    millions of rows into a keyspace whose cardinality is the VOCAB —
    when the vocabulary is small the shuffle lands on ≤|vocab|
    reducers no matter how many partitions are configured, and each
    decade multiplies rows-per-reducer (measured 59.7× time at 10×
    data, sf10→sf100, before this fix). df is |vocab| rows of 16
    bytes, so the correct plan is a broadcast-hash join — tf streams
    straight out of its aggregate with NO exchange on token. The
    1-row decision job (df persisted, token bytes summed — the dedup
    max-df device) keeps the shuffle join available for corpora whose
    vocab outgrows a sane broadcast (rows-per-key skew vanishes in
    exactly that regime). The decision is on ESTIMATED BYTES
    (sum(length(token)) + fixed row overhead), not row count, so a
    long-token vocabulary can't blow past a size the row count alone
    would admit (ADVICE r12)."""
    from data_collection_ieee_spark.catalog import persist_tracked

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = persist_tracked(
        tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    )
    sz = df.agg(
        (
            F.coalesce(F.sum(F.length("token")), F.lit(0))
            + F.count("*") * _VOCAB_ROW_OVERHEAD
        ).alias("est_bytes")
    ).collect()[0]["est_bytes"]
    n = docs.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(df) if sz <= _BROADCAST_VOCAB_MAX_BYTES else df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


@query(
    "text_lang_stats",
    oracle="""
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       quantile_cont(n_chars, 0.5) AS median_chars
FROM documents
GROUP BY lang, source
""",
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.percentile("n_chars", 0.5).alias("median_chars"),
    )


# Tiny marker lexicons per language; the n-gram-heuristic shape of a
# real language identifier, evaluable identically in both engines.
_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "la", "les", "et"),
}


def _sql_score(lang: str) -> str:
    lst = "', '".join(_MARKERS[lang])
    return f"len(list_intersect(string_split(text,' '), ['{lst}']))"


@query(
    "text_lang_id",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_sql_score('en')} AS s_en,
         {_sql_score('de')} AS s_de,
         {_sql_score('es')} AS s_es,
         {_sql_score('fr')} AS s_fr
  FROM documents
)
SELECT doc_id,
       CASE
         WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         WHEN s_es >= s_fr THEN 'es'
         ELSE 'fr'
       END AS pred_lang,
       lang AS actual_lang
FROM scored
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID (the n-gram-heuristic pattern): score
    each candidate language by marker-token overlap, pick the argmax
    with a fixed tie-break order. Single narrow pass, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in ms])))
        for lang, ms in _MARKERS.items()
    }
    scored = docs.select(
        "doc_id", F.col("lang").alias("actual_lang"),
        *[scores[lang].alias(f"s_{lang}") for lang in _MARKERS],
    )
    pred = (
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_es")) & (F.col("s_de") >= F.col("s_fr")), "de")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr")
    )
    return scored.select("doc_id", pred.alias("pred_lang"), "actual_lang")


@query(
    "text_quality_score",
    oracle=f"""
WITH feats AS (
  SELECT doc_id,
         CAST(length(text) AS INT) AS n_chars_txt,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> list_contains(['{_SQL_STOP}'], t))) AS INT) AS n_stop,
         CAST(length(replace(text, ' ', '')) AS INT) AS n_alpha
  FROM documents
)
SELECT doc_id, n_chars_txt, n_tokens,
       round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
       round(CAST(n_alpha AS DOUBLE) / n_chars_txt, 4) AS alpha_ratio,
       round(CAST(n_alpha AS DOUBLE) / n_tokens, 4) AS avg_token_len
FROM feats
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality features (length / stopword / character ratios)
    — the heuristic pre-filter stage of an LLM data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    feats = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_txt"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias("n_stop"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("n_alpha"),
    )
    return feats.select(
        "doc_id",
        "n_chars_txt",
        "n_tokens",
        F.round(F.col("n_stop").cast("double") / F.col("n_tokens"), 4).alias("stopword_ratio"),
        F.round(F.col("n_alpha").cast("double") / F.col("n_chars_txt"), 4).alias("alpha_ratio"),
        F.round(F.col("n_alpha").cast("double") / F.col("n_tokens"), 4).alias("avg_token_len"),
    )


@query(
    "text_token_count",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INT) AS re_tokens,
       CAST(length(text) AS INT) AS n_chars_txt
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenizer + BPE-ish regex tokenizer ([a-z]+|[0-9]+
    runs), both as codegen'd expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), F.lit(0))).alias(
            "re_tokens"
        ),
        F.length("text").alias("n_chars_txt"),
    )


@query(
    "text_fingerprint",
    oracle="""
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS vocab_fp,
         list_min([CAST('0x' || substr(md5(substr(text, 1 + 4 * j, 8)), 1, 15) AS BIGINT)
                   for j in range(0, CAST(ceil((length(text) - 7) / 4.0) AS BIGINT))]) AS kgram_min_hash
  FROM documents
  WHERE length(text) >= 8
)
SELECT doc_id, vocab_fp, kgram_min_hash,
       COUNT(*) OVER (PARTITION BY vocab_fp) AS vocab_group_size
FROM fp
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two content fingerprints per document:
    - `vocab_fp`: md5 of the sorted distinct token set (order/dup-
      insensitive content signature — the exact-dedup key family);
    - `kgram_min_hash`: min over 8-char-gram hashes sampled at stride 4
      (winnowing-style subsample — every char is covered by two grams,
      at a quarter of the hash calls of the dense rolling version; the
      md5-derived 60-bit hash is bit-identical across engines).
    Plus the vocab-fingerprint group size via one windowed count."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 8)
    vocab_fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ").cast("binary")
    )
    kgram = F.expr(
        "array_min(transform(sequence(0, cast(ceil((length(text) - 7) / 4.0) as int) - 1), "
        "j -> cast(conv(substring(md5(cast(substring(text, 1 + 4 * j, 8) as binary)), 1, 15), 16, 10) as bigint)))"
    )
    fp = docs.select(
        "doc_id", vocab_fp.alias("vocab_fp"), kgram.alias("kgram_min_hash")
    )
    return fp.withColumn(
        "vocab_group_size", F.count("*").over(Window.partitionBy("vocab_fp"))
    )


_TOP_NGRAMS = 5


@query(
    "text_ngram_freq",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT lang, unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS bigram
  FROM toks
),
counted AS (
  SELECT lang, bigram, COUNT(*) AS n FROM grams GROUP BY lang, bigram
),
ranked AS (
  SELECT lang, bigram, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram ASC) AS rnk
  FROM counted
)
SELECT lang, bigram, n, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {_TOP_NGRAMS}
""",
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigrams per language — the n-gram frequency table corpus
    analysis starts from. Bigrams are built in-row (slide over the
    token array), counted with one map-side-combined shuffle, and the
    per-language top-N comes from a window over the small counted
    frame with a deterministic (count desc, bigram asc) tie-break.

    The tokenization is hoisted into its own projection so ``split``
    runs once per document; inlining it in the slide lambda would
    re-split the text for every bigram (O(len²) per doc — measured 3×
    slower at sf0.1)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.split("text", " ").alias("t"))
    grams = toks.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"
            )
        ).alias("bigram"),
    )
    counted = grams.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counted.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _TOP_NGRAMS)
    )


@query(
    "text_pii_redact",
    oracle=r"""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 <> 0
              THEN 'contact user' || CAST(doc_id AS VARCHAR) || '@example.com ' ELSE '' END
         || CASE WHEN doc_id % 2 = 0
              THEN 'call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' ELSE '' END
         || substr(text, 1, 40) AS raw
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+', '<EMAIL>', 'g'),
                      '\d{3}-\d{4}', '<PHONE>', 'g') AS redacted,
       CAST(len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(raw, '\d{3}-\d{4}')) AS INT) AS n_phones
FROM seeded
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction stage every training-data pipeline
    runs before release. The synthetic corpus carries no natural PII,
    so the query first plants deterministic email/phone strings (same
    construction in the oracle), then scrubs them with chained
    regexp_replace and counts matches per class. Pure in-row JVM regex:
    no shuffle, scales linearly, and the patterns are the
    Java-regex/RE2 common subset so both engines agree byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    email_pat = r"[a-z0-9.]+@[a-z0-9.]+\.[a-z]+"
    phone_pat = r"\d{3}-\d{4}"
    raw = F.concat(
        F.when(
            did % 3 != 0,
            F.concat(F.lit("contact user"), did.cast("string"), F.lit("@example.com ")),
        ).otherwise(F.lit("")),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit("call 555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
                F.lit(" "),
            ),
        ).otherwise(F.lit("")),
        F.substring("text", 1, 40),
    )
    seeded = docs.select("doc_id", raw.alias("raw"))
    return seeded.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("raw", email_pat, "<EMAIL>"), phone_pat, "<PHONE>"
        ).alias("redacted"),
        F.regexp_count("raw", F.lit(email_pat)).cast("int").alias("n_emails"),
        F.regexp_count("raw", F.lit(phone_pat)).cast("int").alias("n_phones"),
    )


_REP_TOP_TOK_PCT = 12  # flag if the most common token exceeds 12% of tokens
_REP_DUP_BIGRAM_PCT = 5  # flag if >5% of bigrams are repeats


@query(
    "text_repetition_signals",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
sig AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(list_max(list_transform(list_distinct(toks),
         u -> len(list_filter(toks, x -> x = u)))) AS BIGINT) AS top_tok_cnt,
    CAST(len(toks) - 1 AS BIGINT) AS n_bigrams,
    CAST((len(toks) - 1) - len(list_distinct(list_transform(range(1, len(toks)),
         i -> array_to_string(list_slice(toks, i, i+1), ' ')))) AS BIGINT) AS dup_bigram_cnt
  FROM t
)
SELECT doc_id, n_tokens, top_tok_cnt, n_bigrams, dup_bigram_cnt,
       CASE WHEN 100 * top_tok_cnt > {_REP_TOP_TOK_PCT} * n_tokens THEN 'repetitive_tokens'
            WHEN 100 * dup_bigram_cnt > {_REP_DUP_BIGRAM_PCT} * n_bigrams THEN 'repetitive_bigrams'
            ELSE 'keep' END AS verdict
FROM sig
""",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    per document, the count of the single most frequent token and the
    number of duplicated word bigrams, plus a keep/flag verdict from
    integer threshold tests (100*cnt > pct*total — no float ratios, so
    the hash can't drift on rounding). See `_repetition_signals` for
    the two-path (in-row vs explode) plan."""
    return _repetition_signals(load_table(spark, sf_dir, "documents"))


_REP_LONG_DOC_TOKENS = 4096  # docs longer than this take the explode path


def _repetition_signals(
    docs: DataFrame, long_doc_tokens: int = _REP_LONG_DOC_TOKENS
) -> DataFrame:
    """Core of `text_repetition_signals` over any (doc_id, text) frame,
    with a size-gated plan split (VERDICT r5 #5):

    - docs ≤ `long_doc_tokens` tokens: everything IN-ROW with
      higher-order functions (array_distinct / filter / transform over
      the token array) — zero shuffles, one narrow codegen'd pass. The
      top-token count is O(u·n) per row (u = distinct tokens), the
      right trade at this size.
    - docs above the gate (book-length): the O(u·n) scan would be
      quadratic-ish per row (a 500k-token book with 50k distinct
      tokens is 2.5e10 comparisons in ONE task), so long docs switch
      to explode + groupBy(doc_id, token) → max for the top-token
      count and a distinct count over in-row bigram HASHES (xxhash64
      of token-hash pairs — never materialized bigram strings) for the
      duplicate-bigram count. Two map-side-combined shuffles over only
      the long-doc subset, each key bounded by one document.

    Both paths emit identical columns and union into one frame; the
    fixture corpus (≤ 99 tokens) takes the in-row path exclusively, so
    the oracle row is unchanged, while the gate is exercised by a
    synthetic-long-doc pytest asserting the paths agree."""
    toks = F.split("text", " ")
    base = docs.select("doc_id", toks.alias("toks")).withColumn(
        "n_tokens", F.size("toks").cast("long")
    )
    short = base.filter(F.col("n_tokens") <= long_doc_tokens)
    longd = base.filter(F.col("n_tokens") > long_doc_tokens)

    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.array_join(F.slice(F.col("toks"), i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sig_short = short.select(
        "doc_id",
        "n_tokens",
        F.array_max(
            F.transform(
                F.array_distinct("toks"),
                lambda u: F.size(F.filter(F.col("toks"), lambda x: x == u)),
            )
        ).cast("long").alias("top_tok_cnt"),
        (F.size("toks") - 1).cast("long").alias("n_bigrams"),
        ((F.size("toks") - 1) - F.size(F.array_distinct(bigrams)))
        .cast("long")
        .alias("dup_bigram_cnt"),
    )

    top_long = (
        longd.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("top_tok_cnt"))
    )
    bg_long = (
        longd.select(
            "doc_id",
            F.explode(
                F.expr(
                    """
                    element_at(transform(array(transform(toks, t -> xxhash64(t))),
                      th -> transform(sequence(1, size(th) - 1),
                                      i -> xxhash64(slice(th, i, 2)))
                    ), 1)
                    """
                )
            ).alias("bg"),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("bg").cast("long").alias("n_distinct_bg"))
    )
    sig_long = (
        longd.select("doc_id", "n_tokens")
        .join(top_long, "doc_id")
        .join(bg_long, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "top_tok_cnt",
            (F.col("n_tokens") - 1).cast("long").alias("n_bigrams"),
            ((F.col("n_tokens") - 1) - F.col("n_distinct_bg"))
            .cast("long")
            .alias("dup_bigram_cnt"),
        )
    )

    sig = sig_short.unionByName(sig_long)
    return sig.select(
        "doc_id",
        "n_tokens",
        "top_tok_cnt",
        "n_bigrams",
        "dup_bigram_cnt",
        F.when(
            100 * F.col("top_tok_cnt") > _REP_TOP_TOK_PCT * F.col("n_tokens"),
            F.lit("repetitive_tokens"),
        )
        .when(
            100 * F.col("dup_bigram_cnt") > _REP_DUP_BIGRAM_PCT * F.col("n_bigrams"),
            F.lit("repetitive_bigrams"),
        )
        .otherwise(F.lit("keep"))
        .alias("verdict"),
    )


@query(
    "text_token_rarity",
    oracle="""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT SUM(c) AS t, SUM(c * c) AS c2 FROM freq),
per_doc AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens, CAST(SUM(f.c) AS BIGINT) AS sum_freq
  FROM toks t JOIN freq f USING (tok) GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, sum_freq,
       round(CAST(sum_freq AS DOUBLE) / n_tokens, 4) + 0.0 AS avg_freq,
       CASE WHEN 2 * CAST(sum_freq AS HUGEINT) * tot.t
                 < CAST(tot.c2 AS HUGEINT) * n_tokens
            THEN 'rare_tokens' ELSE 'keep' END AS verdict
FROM per_doc, tot
""",
)
def text_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-based quality scoring — the unigram-LM (CCNet-style)
    filter expressed with integer determinism: score each document by
    the mean CORPUS frequency of its tokens and flag documents whose
    mean falls below half the corpus's token-weighted mean frequency
    (rare-token-heavy docs are the noisy/unusual tail a perplexity
    filter would cut; frequency is the monotone integer proxy for
    unigram probability, so no cross-engine ln() in any comparison —
    libm vs Java Math.log differ at 1 ulp exactly where a threshold
    bites).

    Plan: one map-side-combined groupBy builds the corpus frequency
    table (the "language model" — the vocab-count table, bounded by
    VOCABULARY size, which Heaps' law keeps orders of magnitude under
    corpus size); exploded tokens re-join it under an EXPLICIT
    broadcast hint and aggregate per doc (second combine); the two
    corpus moments ride a 1-row broadcast. The hint is load-bearing:
    the token column has vocabulary cardinality, so a shuffle join
    hash-partitions the full exploded corpus into ≤|vocab| effective
    partitions — measured 20.6× per decade at sf1→sf10 (66-token
    fixture vocab, SortMergeJoin) vs ~linear once broadcast. A corpus
    whose vocab outgrows the broadcast threshold no longer HAS a
    low-cardinality token key, and the hint should then be dropped —
    but that regime is >100M distinct tokens, far past any natural
    unigram vocabulary. The flag is an exact integer
    cross-multiplication (2·sum_freq·T < ΣC²·n), decimal-accumulated
    on the Spark side to match DuckDB's 128-bit sums at any volume."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = freq.agg(
        F.sum("c").alias("t"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c")).alias("c2"),
    )
    per_doc = (
        toks.join(F.broadcast(freq), "tok")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("c").alias("sum_freq"))
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_tokens",
        "sum_freq",
        (F.round(F.col("sum_freq").cast("double") / F.col("n_tokens"), 4) + F.lit(0.0)).alias(
            "avg_freq"
        ),
        F.when(
            F.lit(2) * F.col("sum_freq").cast("decimal(19,0)") * F.col("t")
            < F.col("c2") * F.col("n_tokens"),
            F.lit("rare_tokens"),
        )
        .otherwise(F.lit("keep"))
        .alias("verdict"),
    )


@query(
    "text_entropy_quality",
    oracle="""
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
n AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_types FROM tf GROUP BY doc_id)
SELECT n.doc_id,
       CAST(n.n_tokens AS BIGINT) AS n_tokens,
       CAST(n.n_types AS BIGINT) AS n_types,
       round(CAST(n.n_types AS DOUBLE) / n.n_tokens, 4) AS ttr,
       round(CAST(SUM(CAST(round(
           (CAST(tf.c AS DOUBLE) / n.n_tokens)
             * log2(CAST(n.n_tokens AS DOUBLE) / tf.c), 9) AS DECIMAL(20,9)))
         AS DOUBLE), 6) AS entropy_bits
FROM tf JOIN n USING (doc_id)
GROUP BY n.doc_id, n.n_tokens, n.n_types
""",
)
def text_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity quality signals: per-document type/token ratio
    and word-unigram Shannon entropy in bits — the low-end of either
    catches machine-generated or template spam that length/stopword
    heuristics (`text_quality_score`) miss, the standard next filter in
    a curation ladder.

    Determinism: entropy is a SUM of per-type float terms, and double
    summation order differs between engines — so each term
    (c/n)·log2(n/c) is rounded to 9 dp and cast to DECIMAL(20,9), the
    sum runs in exact decimal arithmetic (order-independent), and only
    the final value is cast back to double at 6 dp. Same convention as
    the registry's decimal-sum rule for measures.

    Plan: explode → (doc, token) counts (map-side combined) → per-doc
    moments → join counts back on doc_id for the entropy terms →
    map-side-combined decimal sum. Three shuffles, each keyed by doc_id
    (or doc_id+token), every key bounded by one document's vocabulary —
    no skew beyond the longest single document, so the shape survives
    100 TB unchanged. All codegen; log2 stays in output values only
    (never in a threshold — libm-vs-JVM last-ulp drift can't flip a
    row)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    n = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"), F.count("*").alias("n_types")
    )
    term = F.round(
        (F.col("c").cast("double") / F.col("n_tokens"))
        * F.log2(F.col("n_tokens").cast("double") / F.col("c")),
        9,
    ).cast("decimal(20,9)")
    return (
        tf.join(n, "doc_id")
        .groupBy("doc_id", "n_tokens", "n_types")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("entropy_bits"))
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_types").cast("long").alias("n_types"),
            F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 4).alias("ttr"),
            "entropy_bits",
        )
    )


_TOP_TERMS_K = 3


@query(
    "text_top_terms",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
weighted AS (
  SELECT tf.doc_id, tf.token,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, token, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, token ASC) AS rank
  FROM weighted
)
SELECT doc_id, CAST(rank AS INT) AS rank, token, tfidf FROM ranked WHERE rank <= {_TOP_TERMS_K}
""",
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the top-{{k}} tf-idf terms with
    their rank — the classic document-tagging / index-summary step.
    Ranking happens on the ROUNDED tf-idf (the published value) with a
    lexicographic token tiebreak, so the cut is a total order and the
    result is engine-independent even where raw weights tie.

    Plan: reuses `text_wordcount_tfidf`'s two map-side-combined
    shuffles + 1-row broadcast, then ONE more window keyed by doc_id
    (every partition bounded by a single document's vocabulary) and a
    rank filter that Spark pushes into the window sort as a group
    limit. No global sort anywhere."""
    weighted = text_wordcount_tfidf(spark, sf_dir)
    wd = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        weighted.select("doc_id", "token", "tfidf")
        .withColumn("rank", F.row_number().over(wd))
        .filter(F.col("rank") <= _TOP_TERMS_K)
        .select("doc_id", "rank", "token", "tfidf")
    )


_NOV_NGRAM = 8


@query(
    "text_novelty_ratio",
    oracle=f"""
WITH lists AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - {_NOV_NGRAM - 2}),
             i -> array_to_string(list_slice(string_split(text,' '), i, i+{_NOV_NGRAM - 1}), ' ')))
           AS ngs
  FROM documents
  WHERE len(string_split(text,' ')) >= {_NOV_NGRAM}
),
ng AS (
  SELECT doc_id, len(ngs) AS n_grams, unnest(ngs) AS ngram FROM lists
),
owned AS (
  SELECT doc_id, n_grams,
         CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY ngram) THEN 1 ELSE 0 END AS novel
  FROM ng
)
SELECT doc_id,
       CAST(MAX(n_grams) AS BIGINT) AS n_grams,
       CAST(SUM(novel) AS BIGINT) AS n_novel,
       round(CAST(SUM(novel) AS DOUBLE) / MAX(n_grams), 6) AS novelty
FROM owned GROUP BY doc_id
""",
)
def text_novelty_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a document's distinct word
    8-grams that it is the FIRST document (by doc_id) to contribute to
    the corpus — the incremental-information measure a curation
    pipeline uses to rank near-the-threshold survivors of dedup
    (novelty → 0: the doc is assembled from passages the corpus already
    has, even if no single pair-level duplicate fired; novelty → 1:
    genuinely new text). Complements the pairwise dedup ladder with a
    corpus-global signal.

    Scale shape: 8-grams are built, hashed, and deduped IN-ROW with
    the xxhash64 token-hash device shared with pipeline_decontaminate
    (no n-gram strings ever materialize — the explode-over-transform
    codegen trap), so the exploded frame carries 8-byte keys only.
    First-claimant detection is a single window min over
    partitionBy(gram) — hash-partitioned by gram, never global — and
    the per-doc rollup is one map-side-combined groupBy. Two shuffles
    total, both on keys whose cardinality grows linearly with the
    corpus; no broadcast of anything unbounded. The oracle spells the
    same two-stage reduction over string n-grams: identical semantics
    up to a ~2^-64 hash collision."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    args8 = ", ".join(f"element_at(th, i + {j})" for j in range(_NOV_NGRAM))
    hs = F.expr(
        f"""
        element_at(transform(array(transform(split(text, ' '), t -> xxhash64(t))),
          th -> array_distinct(transform(
            sequence(1, size(th) - {_NOV_NGRAM - 1}),
            i -> xxhash64({args8})))
        ), 1)
        """
    )
    grams = (
        docs.filter(F.size(toks) >= _NOV_NGRAM)
        .select("doc_id", hs.alias("hs"))
        .select(
            "doc_id",
            F.size("hs").cast("long").alias("n_grams"),
            F.explode("hs").alias("h"),
        )
    )
    novel = F.when(
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("h")), 1
    ).otherwise(0)
    return (
        grams.withColumn("novel", novel)
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").cast("long").alias("n_grams"),
            F.sum("novel").cast("long").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel").cast("double") / F.col("n_grams"), 6).alias(
                "novelty"
            ),
        )
    )


@query(
    "text_langid_confusion",
    oracle=f"""
WITH scored AS (
  SELECT lang,
         {_sql_score('en')} AS s_en,
         {_sql_score('de')} AS s_de,
         {_sql_score('es')} AS s_es,
         {_sql_score('fr')} AS s_fr
  FROM documents
),
pred AS (
  SELECT lang AS actual_lang,
         CASE
           WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
           WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
           WHEN s_es >= s_fr THEN 'es'
           ELSE 'fr'
         END AS pred_lang
  FROM scored
),
cells AS (
  SELECT actual_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pred GROUP BY actual_lang, pred_lang
),
rows_tot AS (
  SELECT actual_lang, SUM(n_docs) AS row_n FROM cells GROUP BY actual_lang
)
SELECT c.actual_lang, c.pred_lang, c.n_docs,
       round(CAST(c.n_docs AS DOUBLE) / r.row_n, 6) AS row_share
FROM cells c JOIN rows_tot r ON c.actual_lang = r.actual_lang
""",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-lexicon language classifier
    against the labeled `lang` column — the evaluation step that turns
    `text_lang_id` from a feature into a monitored component (per-class
    recall sits on the diagonal's row_share). The classifier expression
    is the SAME argmax used by text_lang_id, re-stated here so the two
    queries cannot drift apart silently; the corpus collapses through
    one map-side-combined groupBy to ≤ |langs|² cells, and the per-row
    totals re-aggregate that tiny frame (scanned once, joined
    broadcast). Cardinality is independent of corpus size — the 100 TB
    cost is one narrow scan plus one tiny shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in ms])))
        for lang, ms in _MARKERS.items()
    }
    scored = docs.select(
        F.col("lang").alias("actual_lang"),
        *[scores[lang].alias(f"s_{lang}") for lang in _MARKERS],
    )
    pred = (
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_es")) & (F.col("s_de") >= F.col("s_fr")), "de")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr")
    )
    cells = (
        scored.select("actual_lang", pred.alias("pred_lang"))
        .groupBy("actual_lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    rows_tot = cells.groupBy("actual_lang").agg(F.sum("n_docs").alias("row_n"))
    return cells.join(F.broadcast(rows_tot), "actual_lang").select(
        "actual_lang",
        "pred_lang",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("row_n"), 6).alias(
            "row_share"
        ),
    )


_LINE_TOKENS = 8  # tokens per "line" (chunk) for corpus-level line dedup
_LINE_KEYMUL = 1 << 20  # doc_id * this + idx: idx < 2^20 ⇒ unique bigint


@query(
    "text_line_dedup",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
chunks AS (
  SELECT doc_id, i AS idx,
         array_to_string(t[i*{_LINE_TOKENS}+1 : i*{_LINE_TOKENS}+{_LINE_TOKENS}],
                         ' ') AS chunk
  FROM toks,
       UNNEST(generate_series(
         0, CAST(ceil(len(t) / {_LINE_TOKENS}.0) AS BIGINT) - 1)) AS u(i)
),
first AS (
  SELECT chunk, MIN(doc_id * {_LINE_KEYMUL} + idx) AS fk
  FROM chunks GROUP BY chunk
)
SELECT c.doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN c.doc_id * {_LINE_KEYMUL} + c.idx = f.fk
                     THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
       COALESCE(string_agg(CASE WHEN c.doc_id * {_LINE_KEYMUL} + c.idx = f.fk
                                THEN c.chunk END, ' ' ORDER BY c.idx), '')
         AS cleaned_text
FROM chunks c JOIN first f USING (chunk)
GROUP BY c.doc_id
""",
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line deduplication (the C4/RefinedWeb cleaning
    step): every document is cut into fixed-width 8-token "lines",
    each distinct line keeps only its FIRST corpus occurrence (ordered
    by doc_id, then position), and documents are reassembled from
    their surviving lines. Unlike dedup_substring_exact (which REPORTS
    duplicated passages), this REWRITES the corpus — the output is the
    cleaned training text plus per-document retention counts, which is
    what a curation pipeline materializes.

    Shape — the MapReduce line-dedup, fully shuffle-bounded: explode to
    (line, doc, idx) rows; ONE groupBy on the line text finds the
    min (doc,idx) occurrence key (map-side combined — the dominant
    dup mass collapses before the shuffle); join back on the same
    line key (shuffle reused, no second partitioning); ONE groupBy on
    doc_id reassembles with an in-row sort_array — never a global
    sort, never an all-pairs comparison. At 100 TB each shuffle is
    hash-partitioned on high-cardinality keys (line text / doc_id) —
    the plan is three map-side-combined exchanges regardless of
    corpus size. First-occurrence keys are exact bigints
    (doc_id·2^20 + idx), so both engines pick the same survivor."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, CAST(ceil(size(toks) / "
                    f"{_LINE_TOKENS}.0) AS INT) - 1), "
                    f"i -> array_join(slice(toks, i*{_LINE_TOKENS}+1, "
                    f"{_LINE_TOKENS}), ' '))"
                )
            ).alias("idx", "chunk"),
        )
        .withColumn(
            "key", F.col("doc_id") * F.lit(_LINE_KEYMUL) + F.col("idx")
        )
    )
    first = chunks.groupBy("chunk").agg(F.min("key").alias("fk"))
    kept = chunks.join(first, "chunk").withColumn(
        "is_first", F.col("key") == F.col("fk")
    )
    return kept.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.col("is_first").cast("long")).alias("kept_chunks"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("is_first"),
                            F.struct(F.col("idx"), F.col("chunk")),
                        )
                    )
                ),
                lambda s: s.chunk,
            ),
            " ",
        ).alias("cleaned_text"),
    )


@query(
    "text_unigram_perplexity",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
lm AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
tot AS (SELECT COUNT(*) AS total FROM tok)
SELECT t.doc_id,
       CAST(COUNT(*) AS INT) AS n_tokens,
       round(CAST(-SUM(CAST(ln(CAST(lm.c AS DOUBLE) / tot.total)
                            AS DECIMAL(38,18)))
                  AS DOUBLE) / COUNT(*), 6) AS cross_entropy
FROM tok t JOIN lm ON t.token = lm.token, tot
GROUP BY t.doc_id
""",
)
def text_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram
    language model — the classic LM-based quality signal for
    training-data curation (documents whose tokens are corpus-typical
    score low; gibberish and off-distribution text score high; CCNet /
    Gopher-style filtering thresholds on exactly this number).

    Three map-side-combined shuffles, all keyed sensibly at 100 TB:
    (1) token counts — the LM itself, one groupBy(token); (2) the
    token-stream ⋈ LM join on token — explicitly BROADCAST: the LM is
    vocabulary-bounded (Heaps' law keeps it orders under corpus size),
    and a shuffle join on the token key would cap parallelism at
    |vocab| effective partitions while rows grow with the corpus (the
    text_token_rarity lesson, Addendum 9 — measured 48 s → 5 s at
    sf10 under 1024 shuffle partitions); (3) per-doc aggregation on
    doc_id. The corpus total rides in as a broadcast 1-row frame. Per-token ln() values are doubles (bitwise
    identical across engines), but their per-doc SUM is made
    order-independent by casting each term to DECIMAL(38,18) before
    summing — same determinism device as the PageRank rank sums —
    then one division and round(6) at the end.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    lm = tok.groupBy("token").agg(F.count("*").alias("c"))
    # corpus total = Σc over the (vocabulary-sized) LM — no third scan
    total = lm.groupBy().agg(F.sum("c").alias("total"))
    term = F.log(F.col("c").cast("double") / F.col("total")).cast(
        "decimal(38,18)"
    )
    return (
        tok.join(F.broadcast(lm), "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.round(
                (-F.sum(term)).cast("double") / F.count("*"), 6
            ).alias("cross_entropy"),
        )
    )


# collocation support floor: a bigram must occur this often to be scored
# (PMI of rare pairs is noise — the standard NLP practice)
_PMI_MIN_COUNT = 5


@query(
    "text_pmi_collocations",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
big AS (
  SELECT unnest(list_zip(t[1:len(t) - 1], t[2:])) AS z FROM tok
),
pairs AS (
  SELECT z[1] AS w1, z[2] AS w2, COUNT(*) AS c_ab
  FROM big GROUP BY 1, 2
),
uni AS (
  SELECT unnest(t) AS w FROM tok
),
uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
np AS (SELECT SUM(c_ab) AS n_pairs FROM pairs),
nu AS (SELECT SUM(c) AS n_uni FROM uc)
SELECT p.w1, p.w2, p.c_ab,
       round(ln((CAST(p.c_ab AS DOUBLE) / np.n_pairs)
                / ((CAST(ua.c AS DOUBLE) / nu.n_uni)
                   * (CAST(ub.c AS DOUBLE) / nu.n_uni))), 6) AS pmi
FROM pairs p
JOIN uc ua ON p.w1 = ua.w
JOIN uc ub ON p.w2 = ub.w, np, nu
WHERE p.c_ab >= {_PMI_MIN_COUNT}
""",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations: adjacent token pairs
    whose co-occurrence beats chance (PMI = ln(p(ab)/(p(a)p(b)))), the
    classic phrase/vocabulary-mining pass a tokenizer-training or
    n-gram-merge pipeline runs over the corpus (Mikolov-style phrase
    detection is exactly this plus a threshold).

    Adjacency pairs are built IN-ROW (arrays_zip of the token array
    against its shift padded with one NULL — no positional self-join),
    so each doc-final token still emits a (w, NULL) cell and the
    corpus is scanned ONCE: unigram counts are exactly the w1-margin
    of the (w1, w2) cell frame (every token occurs exactly once in w1
    position), re-aggregated from the vocabulary²-bounded cells rather
    than a second explode of the corpus (the two-scan form measured
    15× per decade at sf1→sf10; this form re-uses the one exchange).
    Scalar totals are 1-row re-aggregations riding broadcasts. The
    support floor (c_ab ≥ 5) is the standard rare-pair noise cut,
    applied as an integer compare.
    """
    toks = F.split("text", " ")
    cells = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.arrays_zip(
                    toks.alias("w1"),
                    F.concat(
                        F.slice(toks, 2, F.size(toks) - 1),
                        F.array(F.lit(None).cast("string")),
                    ).alias("w2"),
                )
            ).alias("z")
        )
        .groupBy(F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
        .agg(F.count("*").alias("c_ab"))
        .localCheckpoint(eager=True)  # bounded: ≤ vocabulary² + vocab cells
    )
    pairs = cells.filter(F.col("w2").isNotNull())
    uni = cells.groupBy("w1").agg(F.sum("c_ab").alias("c")).select(
        F.col("w1").alias("w"), "c"
    )
    n_pairs = pairs.groupBy().agg(F.sum("c_ab").alias("n_pairs"))
    n_uni = uni.groupBy().agg(F.sum("c").alias("n_uni"))
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    pmi = F.log(
        (F.col("c_ab").cast("double") / F.col("n_pairs"))
        / (
            (F.col("c_a").cast("double") / F.col("n_uni"))
            * (F.col("c_b").cast("double") / F.col("n_uni"))
        )
    )
    return (
        pairs.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        .join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(n_uni))
        .select("w1", "w2", "c_ab", F.round(pmi, 6).alias("pmi"))
    )

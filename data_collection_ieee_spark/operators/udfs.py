"""UDF / UDAF / UDTF surface (SURVEY.md §2B).

Demonstrates all four Python-extension points with their cost model
stated plainly:

- `udf_scalar`  row-at-a-time Python UDF (the SLOW path — serde per
                row; kept because the reference's `quote()` call,
                main.py:46, is exactly this shape)
- `udf_pandas`  vectorized pandas UDF (Arrow batches, ~10-100× the
                row UDF)
- `udaf_pandas` grouped-agg pandas UDF
- `udtf_surface` Python UDTF (one row → N rows), the reference's
                page→records expansion (mainn.py:62-83) as a table
                function
- `udf_grouped_map` applyInPandas split-apply-combine (whole group in,
                whole frame out)

Everything else in this engine deliberately avoids Python in the hot
path; this module exists to cover the extension surface itself.
"""

from __future__ import annotations

from urllib.parse import quote

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from data_collection_ieee_spark.catalog import load_table
from data_collection_ieee_spark.operators.similarity import PROBE_VEC_ID
from data_collection_ieee_spark.registry import query


@query(
    "udf_scalar",
    oracle="""
SELECT doc_id, replace(text, ' ', '%20') AS url_encoded
FROM documents
""",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `quote(query)` URL-encoding (main.py:46) as a
    Python UDF. (The oracle's replace() is equivalent on this corpus —
    lowercase words + spaces — since quote() escapes only the space.)
    """

    # no type hints on purpose: F.udf treats `str -> str` hints as an
    # Arrow-UDF eval-type inference request and warns it cannot infer;
    # the explicit StringType() return type is the whole contract here
    @F.udf(StringType())
    def url_encode(s):
        return quote(s) if s is not None else None

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", url_encode("text").alias("url_encoded"))


@query(
    "udf_pandas",
    oracle=f"""
WITH probe AS (SELECT embedding FROM embeddings WHERE vec_id = {PROBE_VEC_ID})
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(p.embedding AS DOUBLE[])), 4) AS cos_sim
FROM embeddings e, probe p
""",
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized cosine against the probe vector as a pandas UDF —
    whole Arrow batches hit numpy at once (compare udf_scalar's per-row
    serde). Same rounding contract as the similarity module."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe_row = emb.filter(F.col("vec_id") == PROBE_VEC_ID).select("embedding").head()
    probe = np.asarray(probe_row[0], dtype=np.float64)
    probe_norm = float(np.linalg.norm(probe))

    @F.pandas_udf("double")
    def cos_to_probe(col: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
        dots = mat @ probe
        norms = np.linalg.norm(mat, axis=1)
        return pd.Series(np.round(dots / (norms * probe_norm), 4))

    return emb.select("vec_id", cos_to_probe("embedding").alias("cos_sim"))


@query(
    "udaf_pandas",
    oracle="""
SELECT event_type,
       round(exp(AVG(CASE WHEN value > 0 THEN ln(value) END)), 6) AS geo_mean_value,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: geometric mean (exp∘mean∘log) — an
    aggregate Spark has no built-in for. Defined over POSITIVE values
    only (the standard domain: ln(0) is undefined, and sf0.1 contains
    zero-valued events); `n` still counts every row. Rounded to 6:
    log-sum error across engines is ~1e-12 on these magnitudes."""

    @F.pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        x = v.to_numpy(dtype=np.float64)
        x = x[x > 0]
        return float(np.round(np.exp(np.log(x).mean()), 6))

    ev = load_table(spark, sf_dir, "events")
    # Spark forbids mixing a grouped-agg pandas UDF with JVM aggregates
    # in one agg(); run them as two aggregations joined on the tiny key.
    geo = ev.groupBy("event_type").agg(geo_mean("value").alias("geo_mean_value"))
    n = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    return geo.join(n, "event_type")


@query(
    "udtf_surface",
    oracle="""
SELECT doc_id,
       CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
       unnest(string_split(text, ' ')) AS token
FROM documents
""",
)
def udtf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (one row → N rows): the reference's page→records
    expansion (mainn.py:62-83) as a LATERAL table function."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class SplitTokens:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("split_tokens", SplitTokens)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_udtf_v")
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.token
        FROM documents_udtf_v d, LATERAL split_tokens(d.text) s
        """
    )


@query(
    "udf_grouped_map",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       round((o_totalprice - MIN(o_totalprice) OVER w)
             / (MAX(o_totalprice) OVER w - MIN(o_totalprice) OVER w), 6) AS price_scaled
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus)
""",
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): each group arrives as one
    pandas DataFrame, is transformed wholesale (per-status min-max
    scaling), and returns a new frame — the split-apply-combine
    extension point for group-local logic that won't fit an aggregate
    (training-pipeline uses: per-domain feature scaling, per-group
    resampling). Deterministic because min/max are exact and the scale
    expression is one fixed IEEE op sequence, so the pandas result
    equals the window-function oracle bit-for-bit after rounding."""

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = pdf["o_totalprice"].min()
        hi = pdf["o_totalprice"].max()
        out = pdf[["o_orderkey", "o_orderstatus"]].copy()
        out["price_scaled"] = ((pdf["o_totalprice"] - lo) / (hi - lo)).round(6)
        return out

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return o.groupBy("o_orderstatus").applyInPandas(
        scale, schema="o_orderkey bigint, o_orderstatus string, price_scaled double"
    )

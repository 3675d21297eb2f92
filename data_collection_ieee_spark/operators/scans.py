"""Scan / source / sink operators (SURVEY.md §2B "Scans / sources / sinks").

Mirrors the reference's I/O boundary — pandas ``to_csv`` (reference
main.py:194) and pretty-JSON dump (main.py:197-198) — as Spark
distributed sinks, plus the cross-source schema-drift union implied by
its 11-col IEEE vs 9-col ACM record layouts (main.py:94-107 vs
mainn.py:67-83).

Scale notes: the parquet scan is the Tungsten vectorized reader with
column pruning (ReadSchema carries only projected columns); the CSV/JSON
round-trips write one file per partition — at 100 TB these sinks
parallelize for free, no driver-side collection anywhere.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table
from data_collection_ieee_spark.registry import query

_ROUNDTRIP_COLS = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"]
_ROUNDTRIP_SCHEMA = (
    "l_orderkey bigint, l_linenumber int, l_quantity double, "
    "l_extendedprice double, l_returnflag string"
)


def _scratch(tag: str) -> str:
    base = os.path.join(tempfile.gettempdir(), "dcis_scratch")
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, tag)


@query(
    "scan_parquet",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
""",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Count-preserving projection; .explain shows ReadSchema limited to
    # these 5 columns (column pruning reaches the parquet footer).
    return load_table(spark, sf_dir, "lineitem").select(*_ROUNDTRIP_COLS)


@query(
    "scan_csv_roundtrip",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
""",
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 CSV sink semantics: header row, UTF-8, quoted as needed —
    written distributed, read back with an explicit schema (no
    inference pass over the data)."""
    path = _scratch("csv_roundtrip")
    df = load_table(spark, sf_dir, "lineitem").select(*_ROUNDTRIP_COLS)
    df.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(_ROUNDTRIP_SCHEMA).option("header", True).csv(path)


@query(
    "scan_json_roundtrip",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
""",
)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 JSON sink semantics (non-ASCII preserved; JSON-lines layout —
    the distributed-scale form of the reference's array dump)."""
    path = _scratch("json_roundtrip")
    df = load_table(spark, sf_dir, "lineitem").select(*_ROUNDTRIP_COLS)
    df.write.mode("overwrite").json(path)
    return spark.read.schema(_ROUNDTRIP_SCHEMA).json(path)


@query(
    "union_schema_drift",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(NULL AS VARCHAR) AS o_orderstatus,
       CAST(NULL AS VARCHAR) AS o_orderpriority
FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       o_orderstatus, o_orderpriority
FROM orders WHERE o_orderstatus = 'F'
""",
)
def union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: the 11-col IEEE / 9-col ACM drift union, re-created on
    `orders` — two overlapping projections reunified by name with null
    fill for the missing columns."""
    od = load_table(spark, sf_dir, "orders")
    wide = od.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    narrow = od.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    return wide.unionByName(narrow, allowMissingColumns=True)


@query(
    "scan_partition_pruned",
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE lang IN ('fr', 'de')
""",
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition pruning: documents are
    written once per scale factor as parquet partitioned by `lang`
    (directory-per-value), and the query's lang predicate is satisfied
    by PRUNING — the fr/de directories are the only ones listed or
    opened, visible as PartitionFilters in the scan node. At 100 TB
    this is the difference between scanning two languages and scanning
    the corpus; the partition column itself costs zero bytes in the
    files."""
    path = _scratch(f"docs_by_lang_{sf_dir.strip('/').replace('/', '_')}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "documents")
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(path)
        )
    return (
        spark.read.parquet(path)
        .filter(F.col("lang").isin("fr", "de"))
        .select("doc_id", "lang", "source", "n_chars")
    )


_BLOB_DIR = os.path.join(tempfile.gettempdir(), "dcis_scratch", "blob_fixture")
_N_BLOBS = 100


def _ensure_blob_fixture() -> str:
    """Deterministic binary fixture files (created once per machine):
    the same bytes are read by Spark's binaryFile source and DuckDB's
    read_blob, making binary ingestion differentially checkable."""
    if not os.path.isdir(_BLOB_DIR) or len(os.listdir(_BLOB_DIR)) != _N_BLOBS:
        os.makedirs(_BLOB_DIR, exist_ok=True)
        for i in range(_N_BLOBS):
            with open(os.path.join(_BLOB_DIR, f"doc_{i:04d}.bin"), "wb") as f:
                f.write((f"payload-{i}-" * (i + 1)).encode("ascii"))
    return _BLOB_DIR


_ensure_blob_fixture()


@query(
    "scan_binaryfile",
    oracle=f"""
SELECT CAST(regexp_extract(filename, 'doc_(\\d+)\\.bin', 1) AS BIGINT) AS blob_id,
       CAST(size AS BIGINT) AS n_bytes,
       md5(CAST(content AS VARCHAR)) AS content_md5
FROM read_blob('{_BLOB_DIR}/*.bin')
""",
)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-payload ingestion via the binaryFile source — the front
    door for multimodal data (images/audio land as whole files): one
    row per file with (path, length, bytes), id recovered from the
    filename, content fingerprinted. The format never decodes anything
    and parallelizes by file; pathGlobFilter prunes non-media files at
    listing time. Differentially checked byte-for-byte against DuckDB's
    read_blob over the same fixture directory."""
    _ensure_blob_fixture()
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(_BLOB_DIR)
    )
    return df.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1).cast("long").alias("blob_id"),
        F.col("length").cast("long").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


@query(
    "scan_orc_roundtrip",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
""",
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source roundtrip — the third columnar interchange format
    the engine speaks natively (after parquet and the CSV/JSON text
    sinks of reference main.py:150-156 / mainn.py:108-112). ORC ships
    in Spark's JVM with the same vectorized reader, predicate pushdown,
    and column pruning as parquet, so a user whose downstream stack is
    Hive/ORC gets identical query semantics with zero engine changes.
    Written distributed (one file per task, snappy), read back with the
    explicit schema — no inference pass; the oracle reads the original
    parquet, so the roundtrip is verified value-exact."""
    path = _scratch("orc_roundtrip")
    df = load_table(spark, sf_dir, "lineitem").select(*_ROUNDTRIP_COLS)
    df.write.mode("overwrite").orc(path)
    return spark.read.schema(_ROUNDTRIP_SCHEMA).orc(path)


@query(
    "scan_parquet_merge_schema",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       CAST(NULL AS VARCHAR) AS l_returnflag
FROM lineitem WHERE l_linenumber = 1
UNION ALL
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem WHERE l_linenumber <> 1
""",
)
def scan_parquet_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet generations of the same table
    — an old shard written BEFORE a column existed and a new shard with
    it — read back as one frame via mergeSchema, the reader-side
    counterpart of A11/A12's writer-side schema-drift union (reference
    main.py:94-107 vs mainn.py:67-83: the same dataset, two layouts).
    The old generation's missing column comes back NULL, exactly like
    the oracle's UNION with a NULL cast. mergeSchema is a FOOTER
    operation (Spark merges the schemas from file metadata, one small
    read per file, then plans a single vectorized scan with per-file
    projection) — at 100 TB the cost over a plain scan is one footer
    pass, not a data pass; the split predicate here is only the test
    harness's way of making the two generations disjoint."""
    path_old = _scratch("merge_schema_v1")
    path_new = _scratch("merge_schema_v2")
    li = load_table(spark, sf_dir, "lineitem").select(*_ROUNDTRIP_COLS)
    li.filter(F.col("l_linenumber") == 1).drop("l_returnflag").write.mode(
        "overwrite"
    ).parquet(path_old)
    li.filter(F.col("l_linenumber") != 1).write.mode("overwrite").parquet(path_new)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(path_old, path_new)
        .select(*_ROUNDTRIP_COLS)
    )


_COMPACT_SMALL = 64
_COMPACT_TARGET = 4


@query(
    "sink_compact_small_files",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
""",
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance operation every
    long-lived parquet lake needs: a fragmented dataset (here 64 files
    from an over-partitioned write, the shape a streaming sink or an
    over-parallel job leaves behind) is rewritten into a few
    right-sized files with `repartition(target)`, and the compacted
    copy must be value-identical to the fragmented one. At 100 TB the
    same two-liner runs with target = bytes/128 MB and is the
    difference between a scan scheduling millions of tiny tasks (and
    hammering the namenode/liststore) and one scheduling thousands of
    full ones; correctness is the roundtrip oracle here, and the
    file-count contract (64 → 4) is pinned by pytest since SQL cannot
    see the filesystem."""
    frag = _scratch("compact_fragmented")
    compact = _scratch("compact_done")
    li = load_table(spark, sf_dir, "lineitem").select(*_ROUNDTRIP_COLS)
    li.repartition(_COMPACT_SMALL).write.mode("overwrite").parquet(frag)
    spark.read.schema(_ROUNDTRIP_SCHEMA).parquet(frag).repartition(
        _COMPACT_TARGET
    ).write.mode("overwrite").parquet(compact)
    return spark.read.schema(_ROUNDTRIP_SCHEMA).parquet(compact)


@query(
    "sink_partitioned_overwrite",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem WHERE l_returnflag <> 'R'
UNION ALL
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem WHERE l_returnflag = 'R' AND l_linenumber = 1
""",
)
def sink_partitioned_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the idempotent-backfill primitive:
    rewriting one partition of a partitioned table must replace ONLY
    the partitions present in the incoming data, leaving every other
    partition's files untouched (static overwrite mode would truncate
    the whole table — the classic production data-loss foot-gun this
    operator exists to demonstrate against). Here the table is
    partitioned by l_returnflag, fully written once, then the 'R'
    partition alone is re-written with a reduced slice; the read-back
    must equal other-partitions-unchanged UNION the new 'R' content,
    which is exactly the oracle. The mode is set per-write via
    .option("partitionOverwriteMode", "dynamic") — session config is
    not mutated. pytest additionally pins that the untouched
    partitions' physical files are byte-identical before and after.
    At 100 TB this is how daily reruns land: one partition's files
    swap atomically per rerun, no table-wide rewrite."""
    table = _scratch("dyn_overwrite_table")
    li = load_table(spark, sf_dir, "lineitem").select(*_ROUNDTRIP_COLS)
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(table)
    replacement = li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linenumber") == 1)
    )
    replacement.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("l_returnflag").parquet(table)
    data_schema = "l_orderkey bigint, l_linenumber int, l_quantity double, l_extendedprice double"
    out = spark.read.schema(data_schema).parquet(table)
    # partition column comes back from the directory layout
    return out.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        F.col("l_returnflag").cast("string").alias("l_returnflag"),
    )


@query(
    "scan_text_log_roundtrip",
    oracle="""
SELECT event_id,
       epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
       user_id, event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM events
""",
)
def scan_text_log_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-log ingestion path: events serialized as delimited text
    lines (`spark.write.text`), read back with `spark.read.text` and
    parsed with JVM string functions into typed columns — the pattern
    for the petabytes of application logs that arrive as text, not
    parquet, where the parse must be a narrow per-row map (no UDF, no
    shuffle) so it fuses into whole-stage codegen right above the line
    scan. Timestamps travel as integer epoch-micros and money as
    integer cents, so the roundtrip is exact by construction — the
    same discipline a production log schema needs, since float-in-text
    roundtrips are where silent corruption lives. At 100 TB the text
    read parallelizes by line-splittable blocks exactly like any
    other file scan; the oracle reads the original events table, so
    serialize → write → read → parse is verified value-exact
    end-to-end."""
    path = _scratch("text_log_roundtrip")
    ev = load_table(spark, sf_dir, "events")
    # Null discipline: concat_ws silently DROPS null fields, which would
    # shift every later field during the split-parse and misalign the
    # row instead of round-tripping a null. Encode nulls as an explicit
    # sentinel so the field count is invariant; nullif() restores them
    # on parse. The '|' delimiter is asserted absent from the one
    # free-text field (a '|' inside event_type would also shift the
    # parse) — a production log schema escapes instead; this schema's
    # event_type is a closed enum so fail-loud is the honest contract.
    nul = "\\N"  # the classic text-format null sentinel
    def _s(col):  # serialize one field, null-safe
        return F.coalesce(col.cast("string"), F.lit(nul))

    lines = ev.select(
        F.concat_ws(
            "|",
            _s(F.col("event_id")),
            _s(F.unix_micros("ts")),
            _s(F.col("user_id")),
            _s(F.when(F.col("event_type").contains("|"),
                      F.raise_error(F.lit("event_type contains delimiter '|'")))
               .otherwise(F.col("event_type"))),
            _s(F.round(F.col("value") * 100).cast("long")),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), r"\|")
    def _p(i):  # parse one field, sentinel → null
        return F.nullif(parts.getItem(i), F.lit(nul))

    return raw.select(
        _p(0).cast("long").alias("event_id"),
        _p(1).cast("long").alias("ts_us"),
        _p(2).cast("long").alias("user_id"),
        _p(3).alias("event_type"),
        _p(4).cast("long").alias("value_cents"),
    )


@query(
    "scan_jsonl_nested",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       o_totalprice,
       COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
FROM orders
""",
)
def scan_jsonl_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-document JSONL roundtrip: orders are nested into one
    document per customer ({custkey, n_orders, orders: [{orderkey,
    totalprice}, …]}), written as JSON-lines, read back with an
    EXPLICIT nested schema (array<struct> — no inference pass), and
    flattened with explode. The document-db ingest shape (API exports,
    crawled JSON) that a flat-table engine must round-trip without
    loss; the oracle pins flatten(nest(x)) == x.

    Scale: nesting is one map-side-combined groupBy on the document
    key; the JSONL sink/scan is line-splittable (unlike the
    reference's pretty-printed array, which cannot be parallel-read);
    explode restores row grain without any shuffle. Doubles survive
    bit-exactly via shortest-repr JSON printing + exact parse."""
    path = _scratch("jsonl_nested")
    od = load_table(spark, sf_dir, "orders")
    nested = od.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.collect_list(F.struct("o_orderkey", "o_totalprice")).alias("orders"),
    )
    nested.write.mode("overwrite").json(path)
    schema = (
        "o_custkey long, n_orders long, "
        "orders array<struct<o_orderkey: long, o_totalprice: double>>"
    )
    back = spark.read.schema(schema).json(path)
    return back.select(
        "o_custkey",
        "n_orders",
        F.explode("orders").alias("o"),
    ).select(
        "o_custkey",
        F.col("o.o_orderkey").alias("o_orderkey"),
        F.col("o.o_totalprice").alias("o_totalprice"),
        "n_orders",
    )

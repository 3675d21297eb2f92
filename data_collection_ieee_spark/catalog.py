"""Table catalog over the driver-provided parquet test tables.

The oracle tables (TESTDATA.md / FIXTURES.md §B) live as one parquet
file per table under a scale-factor directory. Readers are plain
``spark.read.parquet`` so Catalyst keeps predicate pushdown, column
pruning, and partition-level parallelism; no schema inference cost
(parquet footers carry the schema).

At 100 TB these would be multi-file partitioned datasets (or Iceberg/
Delta tables); the call sites don't change — only the path/catalog
resolution here does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor —
# region/nation are fixed-cardinality (5/25 rows) by construction.
BROADCAST_DIMS = ("region", "nation")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-zoned TIMESTAMP regardless of
    how the parquet writer encoded it. The driver has regenerated the
    testdata with different encodings across rounds, so every one is a
    first-class input, not a special case:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright;
      with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as long
      nanoseconds → exact integer division to micros (the data is
      microsecond-grained so nothing truncates).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 reads it as
      TIMESTAMP_NTZ → cast to TIMESTAMP. The session timezone is pinned
      UTC (session.py), so the cast is value-preserving and matches the
      DuckDB oracle's naive-timestamp view of the same file.
    - TIMESTAMP(MICROS, UTC): already ``timestamp`` — pass through.

    All three are single JVM-side projections: no UDF, no extra pass,
    scale-invariant.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one oracle table from the scale-factor directory.

    ``events.ts`` is normalized to TIMESTAMP across all parquet
    timestamp encodings the driver has shipped (see
    :func:`normalize_events_ts`).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)

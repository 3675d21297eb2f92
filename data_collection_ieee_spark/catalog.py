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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one oracle table from the scale-factor directory.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright. We read it as raw long nanoseconds
    (``spark.sql.legacy.parquet.nanosAsLong``, a runtime SQLConf) and
    rebuild the timestamp with an exact integer division — the test data
    is microsecond-grained so nothing truncates, and at any scale this
    stays a single JVM-side projection (no UDF, no extra pass).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # Driver data stores ts as TIMESTAMP(NANOS) → read as long nanos;
        # fixture tables may write plain TIMESTAMP(MICROS) → already usable.
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)

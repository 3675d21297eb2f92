"""Structured Streaming parity layer (SURVEY.md §5.3).

The batch `stream_*` operators (operators/streaming_shaped.py) are the
oracle-checked surface; this module runs the SAME logic as real
Structured Streaming jobs — readStream over the events parquet,
availableNow trigger, memory sink — so watermarks, session windows, and
within-watermark dedup (things no SQL oracle can observe) are exercised
against batch-equivalent expectations in tests/test_streaming.py.

At production scale the source swaps for Kafka/files-on-arrival and the
sink for a transactional table; every transformation here is unchanged
— that is the point of the DataFrame-first design.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import normalize_events_ts
from data_collection_ieee_spark.functions.exact import dsum


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 1,
    files_per_trigger: int | None = None,
) -> DataFrame:
    """FileStreamSource requires a *directory* of files (that is the
    files-on-arrival contract), so events.parquet is staged into a
    scratch dir first — stand-in for the landing zone a real deployment
    would already have. With ``n_files > 1`` the table is split into
    that many files and ``files_per_trigger`` can force MULTIPLE
    micro-batches under availableNow — the way tests prove state
    survives batch boundaries.

    readStream needs an explicit schema, but the driver has shipped
    ``events.ts`` under three different parquet encodings across rounds
    (nanos-long / NTZ-micros / UTC-micros), so the schema is taken from
    a batch read of the source file — whatever Spark decodes it as under
    the session's confs IS the stream schema — and the same
    :func:`normalize_events_ts` projection as the batch catalog rebuilds
    a proper TIMESTAMP. The stage dir is keyed on the source file's
    (mtime, size) so regenerated testdata invalidates old stages instead
    of silently pinning them.
    """
    import shutil
    import tempfile

    src = f"{sf_dir}/events.parquet"
    st = os.stat(src)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(src).schema

    root = os.path.join(tempfile.gettempdir(), "dcis_stream_stage")
    prefix = f"{sf_dir.strip('/').replace('/', '_')}_{n_files}"
    stage = os.path.join(root, f"{prefix}_{int(st.st_mtime)}_{st.st_size}")
    if not os.path.exists(stage):
        # drop superseded stages of the same (sf_dir, n_files) — they
        # describe a testdata generation that no longer exists.
        # Known race, accepted for test-only infra: another live session
        # could still be mid-stream over an old stage dir, and deleting
        # it would fail that stream's next micro-batch. ignore_errors
        # keeps THIS side resilient (per-file failures are skipped, so a
        # concurrently-held file never aborts the cleanup); the old
        # session's stream is the casualty. If this ever graduates past
        # tests, key liveness with an access-marker file and skip dirs
        # touched within a TTL.
        if os.path.isdir(root):
            for d in os.listdir(root):
                if d.startswith(prefix + "_") and os.path.join(root, d) != stage:
                    shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        os.makedirs(stage, exist_ok=True)
        if n_files == 1:
            shutil.copy(src, os.path.join(stage, "events.parquet"))
        else:
            import pyarrow.parquet as pq

            tbl = pq.read_table(src)
            step = (tbl.num_rows + n_files - 1) // n_files
            for i in range(n_files):
                chunk = tbl.slice(i * step, step)
                if chunk.num_rows:
                    pq.write_table(chunk, os.path.join(stage, f"events_{i:03d}.parquet"))

    # FileStreamSource admits files in MODIFICATION-TIME order, and two
    # files staged back-to-back can tie (or invert under host load), so
    # without this the micro-batch ORDER is machine-dependent — the one
    # way a deterministic split still yields a nondeterministic stream
    # for order-sensitive state (CUSUM). Pin strictly increasing mtimes
    # in filename order, every call (stage dirs persist across sessions
    # and may predate this stamping).
    for i, fname in enumerate(sorted(os.listdir(stage))):
        t = st.st_mtime + i + 1
        os.utime(os.path.join(stage, fname), (t, t))

    reader = spark.readStream.schema(raw_schema).format("parquet")
    if files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(files_per_trigger))
    return normalize_events_ts(reader.load(stage))


def run_to_memory(
    df: DataFrame, all_updates: bool = False, mode: str | None = None
) -> DataFrame:
    """Execute a streaming DataFrame to completion with the availableNow
    trigger into a memory sink; return the materialized result.
    ``mode`` overrides the output mode (e.g. "update" for
    applyInPandasWithState operators)."""
    name = f"parity_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.outputMode(mode or ("complete" if all_updates else "append"))
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def tumbling_daily(events: DataFrame) -> DataFrame:
    """Same plan as the oracle-checked stream_tumbling operator; works
    unchanged on a batch OR streaming events DataFrame."""
    return (
        events.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total_value")
    )


def session_30m(events: DataFrame, with_watermark: bool) -> DataFrame:
    """Native session_window aggregation (gap 30 min) — the streaming
    twin of the batch lag-gap emulation in stream_session."""
    src = events.withWatermark("ts", "1 hour") if with_watermark else events
    return (
        src.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Streaming dedup by event_id bounded by a watermark — the
    streaming analogue of dedup_exact_key; state is evictable, so it
    runs forever at constant memory."""
    return events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def click_purchase_join(clicks_src: DataFrame, purchases_src: DataFrame) -> DataFrame:
    """Stream-stream inner join: each click joined to the same user's
    purchases within the next 10 minutes. Works identically on batch
    DataFrames (no watermark needed) and on streams, where BOTH sides
    carry watermarks and the join condition bounds event time in both
    directions — that bound is what lets Spark evict join state, so the
    join runs forever at bounded memory. One shuffle per side on
    user_id; state is co-partitioned with the join key."""
    is_streaming = clicks_src.isStreaming
    clicks = clicks_src.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = purchases_src.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if is_streaming:
        clicks = clicks.withWatermark("c_ts", "30 minutes")
        purchases = purchases.withWatermark("p_ts", "30 minutes")
    return clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 10 minutes"
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "c_ts",
        "p_ts",
        "purchase_value",
    )

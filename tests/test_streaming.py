"""Batch ↔ Structured Streaming parity (SURVEY.md §5.3) — the behavior
the DuckDB oracle cannot check: real readStream execution, session
windows, watermark dedup."""

from __future__ import annotations

from data_collection_ieee_spark import registry
from data_collection_ieee_spark.catalog import load_table
from data_collection_ieee_spark.streaming import parity


def _key_rows(rows, cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


def test_tumbling_batch_stream_parity(spark, sf_dir):
    batch = registry.QUERIES["stream_tumbling"](spark, sf_dir).collect()
    stream_df = parity.tumbling_daily(parity.read_events_stream(spark, sf_dir))
    streamed = parity.run_to_memory(stream_df, all_updates=True).collect()
    cols = ["wstart", "event_type", "n", "total_value"]
    assert _key_rows(batch, cols) == _key_rows(streamed, cols)


def test_session_window_matches_lag_emulation(spark, sf_dir):
    """Native session_window (batch mode) must agree with the lag-gap
    cumulative-sum emulation used by the oracle-checked operator."""
    emulated = registry.QUERIES["stream_session"](spark, sf_dir).collect()
    native = parity.session_30m(load_table(spark, sf_dir, "events"), False).collect()
    cols = ["user_id", "session_start", "n_events", "total_value"]
    assert _key_rows(emulated, cols) == _key_rows(native, cols)


def test_session_window_streaming_parity(spark, sf_dir):
    native_batch = parity.session_30m(load_table(spark, sf_dir, "events"), False)
    stream_df = parity.session_30m(parity.read_events_stream(spark, sf_dir), False)
    streamed = parity.run_to_memory(stream_df, all_updates=True)
    cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    assert _key_rows(native_batch.collect(), cols) == _key_rows(streamed.collect(), cols)


def test_dedup_within_watermark(spark, sf_dir):
    events = parity.read_events_stream(spark, sf_dir)
    deduped = parity.run_to_memory(parity.dedup_within_watermark(events))
    n_events = load_table(spark, sf_dir, "events").count()
    # source has unique event_ids: dedup must be lossless on clean data
    assert deduped.count() == n_events
    assert deduped.select("event_id").distinct().count() == n_events

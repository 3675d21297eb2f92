"""Batch ↔ Structured Streaming parity (SURVEY.md §5.3) — the behavior
the DuckDB oracle cannot check: real readStream execution, session
windows, watermark dedup."""

from __future__ import annotations

import os

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


def test_stateful_running_totals_across_microbatches(spark, sf_dir):
    """applyInPandasWithState: replay events as 3 files / 1 file per
    trigger => 3 micro-batches; per-user state must carry across them,
    so each user's LAST emitted row equals the batch groupBy totals."""
    from pyspark.sql import functions as F

    from data_collection_ieee_spark.streaming import stateful

    events = parity.read_events_stream(spark, sf_dir, n_files=3, files_per_trigger=1)
    out = parity.run_to_memory(stateful.running_user_totals(events), mode="update")
    # update mode emits one row per (touched user, micro-batch); the
    # final state per user is the row with the highest n_events
    final = (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value_cents").alias("cents"),
            F.max("last_ts").alias("last_ts"),
        )
        .collect()
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    )
    fk = {r["user_id"]: (r["n_events"], r["last_ts"]) for r in final}
    bk = {r["user_id"]: (r["n_events"], r["last_ts"]) for r in batch}
    assert fk == bk
    # cents totals: both sides round each row to integer cents (HALF_UP,
    # matching F.round) before summing, so totals must be bit-exact and
    # invariant to micro-batch boundaries — no slack allowed
    fc = {r["user_id"]: r["cents"] for r in final}
    bc = {r["user_id"]: r["cents"] for r in batch}
    assert fc == bc


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join (watermarked both sides) must emit
    exactly the batch join's pairs when the stream is fully replayed."""
    ev_batch = load_table(spark, sf_dir, "events")
    batch = parity.click_purchase_join(ev_batch, ev_batch).collect()
    ev_stream = parity.read_events_stream(spark, sf_dir, n_files=3, files_per_trigger=1)
    streamed = parity.run_to_memory(
        parity.click_purchase_join(ev_stream, ev_stream)
    ).collect()
    cols = ["user_id", "click_id", "purchase_id", "c_ts", "p_ts"]
    assert _key_rows(batch, cols) == _key_rows(streamed, cols)
    assert len(batch) > 0  # non-vacuous: the fixture must produce pairs


def test_foreach_batch_sink_exactly_once(spark, sf_dir, tmp_path):
    """The idempotent foreachBatch sink must (a) deliver every source
    row exactly once across micro-batches and (b) skip re-delivered
    batches instead of duplicating or clobbering."""
    from data_collection_ieee_spark.streaming import stateful

    out = str(tmp_path / "sink")
    events = parity.read_events_stream(spark, sf_dir, n_files=3, files_per_trigger=1)
    q = (
        stateful.idempotent_parquet_sink(events.select("event_id", "user_id"), out)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    n_src = load_table(spark, sf_dir, "events").count()
    sunk = spark.read.option("basePath", out).parquet(out + "/batch=*")
    assert sunk.count() == n_src
    assert sunk.select("event_id").distinct().count() == n_src
    # simulate an at-least-once re-delivery of batch 0 with DIFFERENT
    # (truncated) content: the commit marker must make it a no-op
    import os

    batch0 = spark.read.parquet(os.path.join(out, "batch=0"))
    n0 = batch0.count()
    assert os.path.exists(os.path.join(out, "_committed_0"))
    stateful.make_batch_writer(out)(batch0.limit(1), 0)  # replayed delivery
    assert spark.read.parquet(os.path.join(out, "batch=0")).count() == n0


def test_stateful_checkpoint_resume_across_restarts(spark, sf_dir, tmp_path):
    """True restart recovery: run the stateful query to completion, STOP
    it, land a new file, then start a SECOND query on the SAME
    checkpoint. The resumed run must (a) process only the new file and
    (b) emit totals that include the pre-restart state — i.e. per-user
    state survives a cold restart through the state store, not just
    micro-batch boundaries within one run. (The memory sink forbids
    checkpoint recovery, so the repo's idempotent foreachBatch parquet
    sink is the delivery path — exactly what production would use.)"""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from data_collection_ieee_spark.catalog import normalize_events_ts
    from data_collection_ieee_spark.streaming import stateful

    src = f"{sf_dir}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(src).schema
    tbl = pq.read_table(src)
    cut = tbl.num_rows * 2 // 3
    stage = tmp_path / "stage"
    os.makedirs(stage)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")

    def run_once() -> None:
        ev = normalize_events_ts(
            spark.readStream.schema(raw_schema).parquet(str(stage))
        )
        q = (
            stateful.idempotent_parquet_sink(stateful.running_user_totals(ev), out)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def batch_ids() -> set:
        return {
            int(d.split("=")[1]) for d in os.listdir(out) if d.startswith("batch=")
        }

    pq.write_table(tbl.slice(0, cut), str(stage / "part0.parquet"))
    run_once()
    first_ids = batch_ids()
    assert first_ids
    first_users = {
        r["user_id"]
        for i in first_ids
        for r in spark.read.parquet(os.path.join(out, f"batch={i}")).collect()
    }

    pq.write_table(tbl.slice(cut, tbl.num_rows - cut), str(stage / "part1.parquet"))
    run_once()
    new_ids = batch_ids() - first_ids
    assert new_ids  # the restart produced new micro-batches, not a replay
    second = [
        r
        for i in new_ids
        for r in spark.read.parquet(os.path.join(out, f"batch={i}")).collect()
    ]

    # (a) resumed run saw ONLY the second file: it emits rows for the
    # users touched there, not for every user already in the stage dir
    part1_users = {
        r["user_id"]
        for r in spark.read.parquet(str(stage / "part1.parquet"))
        .select("user_id")
        .collect()
    }
    assert {r["user_id"] for r in second} == part1_users
    assert first_users  # both runs delivered rows

    # (b) the resumed totals CONTINUE the first run's state: for every
    # user in the second emission, totals equal the batch aggregate over
    # BOTH files (state restored from the checkpointed store)
    batch = {
        r["user_id"]: (r["n"], r["cents"], r["last_ts"])
        for r in spark.read.parquet(str(stage))
        .transform(normalize_events_ts)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    got = {
        r["user_id"]: (r["n_events"], r["total_value_cents"], r["last_ts"])
        for r in second
    }
    assert got == {u: batch[u] for u in got}


def test_cusum_drift_matches_reference_across_microbatches(spark, sf_dir):
    """applyInPandasWithState CUSUM over 3 micro-batches must equal a
    pure-Python int64 reference that replays the SAME arrival order
    (file-slice chunks, event-time-sorted within each): integer
    arithmetic makes the match exact, so state provably carries the
    detector (not just counters) across batch boundaries."""
    import math

    import pyarrow.parquet as pq

    from data_collection_ieee_spark.streaming import stateful

    events = parity.read_events_stream(spark, sf_dir, n_files=3, files_per_trigger=1)
    out = parity.run_to_memory(stateful.cusum_drift(events), mode="update").collect()
    final = {}
    for r in out:  # last emitted row per key = highest n_seen
        if r["event_type"] not in final or r["n_seen"] > final[r["event_type"]]["n_seen"]:
            final[r["event_type"]] = r

    tbl = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    n = len(tbl["event_id"])
    rows = list(zip(tbl["ts"], tbl["event_id"], tbl["event_type"], tbl["value"]))
    step = math.ceil(n / 3)
    ref = {}
    for b in range(3):
        chunk = sorted(rows[b * step : (b + 1) * step])  # (ts, event_id) order
        for ts, eid, etype, value in chunk:
            s_pos, s_neg, ap, an, n_seen, n_alarms = ref.get(
                etype, (0, 0, False, False, 0, 0)
            )
            cents = int(math.copysign(math.floor(abs(value * 100) + 0.5), value))
            s_pos = max(0, s_pos + cents - 5_000 - 2_500)
            s_neg = max(0, s_neg + 5_000 - cents - 2_500)
            now_ap, now_an = s_pos > 100_000, s_neg > 100_000
            n_alarms += int(now_ap and not ap) + int(now_an and not an)
            ref[etype] = (s_pos, s_neg, now_ap, now_an, n_seen + 1, n_alarms)

    assert set(final) == set(ref)
    for etype, (s_pos, s_neg, ap, an, n_seen, n_alarms) in ref.items():
        r = final[etype]
        assert (
            r["n_seen"],
            r["s_pos_cents"],
            r["s_neg_cents"],
            r["n_alarms"],
            r["drifting"],
        ) == (n_seen, s_pos, s_neg, n_alarms, ap or an), etype


def test_cusum_planted_drift_alarms(spark, tmp_path):
    """Detector semantics on controlled data: a sustained +$40 shift
    and a sustained -$40 shift must each raise exactly one alarm (after
    the shift, never before), while an in-control stream stays silent."""
    import datetime as dt

    import pandas as pd

    from data_collection_ieee_spark.streaming import stateful

    t0 = dt.datetime(2024, 1, 1)
    recs = []
    eid = 0

    def emit(etype, value, n):
        nonlocal eid
        for _ in range(n):
            recs.append(
                {
                    "event_id": eid,
                    "ts": t0 + dt.timedelta(seconds=eid),
                    "user_id": eid % 7,
                    "event_type": etype,
                    "value": value,
                    "props": "{}",
                }
            )
            eid += 1

    emit("stable", 50.0, 300)
    emit("shift_up", 50.0, 100)
    emit("shift_up", 90.0, 200)  # d+ = +1500c/event -> crosses h=100000c once
    emit("shift_down", 50.0, 100)
    emit("shift_down", 10.0, 200)  # d- = +1500c/event -> one alarm
    d = str(tmp_path / "sfcusum")
    os.makedirs(d)
    pd.DataFrame(recs).to_parquet(d + "/events.parquet", index=False)

    events = parity.read_events_stream(spark, d, n_files=2, files_per_trigger=1)
    out = parity.run_to_memory(stateful.cusum_drift(events), mode="update").collect()
    final = {}
    for r in out:
        if r["event_type"] not in final or r["n_seen"] > final[r["event_type"]]["n_seen"]:
            final[r["event_type"]] = r

    # Pin the micro-batch COMPOSITION, not just the values: the 900-row
    # fixture splits at row 450, so shift_up (rows 300-599) straddles
    # the file boundary and must emit one update row per micro-batch.
    # If availableNow ever collapsed the two files into one batch (the
    # load-dependent composition r7 worried about), this fails loudly
    # instead of silently testing single-batch state.
    per_key_updates = {}
    for r in out:
        per_key_updates[r["event_type"]] = per_key_updates.get(r["event_type"], 0) + 1
    assert per_key_updates == {"stable": 1, "shift_up": 2, "shift_down": 1}, (
        per_key_updates
    )
    # and the straddle itself: the first shift_up update saw exactly the
    # 150 file-0 rows, proving state (not a rescan) carried the detector
    shift_up_seen = sorted(r["n_seen"] for r in out if r["event_type"] == "shift_up")
    assert shift_up_seen == [150, 300], shift_up_seen

    assert final["stable"]["n_alarms"] == 0 and not final["stable"]["drifting"]
    assert final["shift_up"]["n_alarms"] == 1 and final["shift_up"]["drifting"]
    assert final["shift_up"]["s_pos_cents"] > 100_000
    assert final["shift_down"]["n_alarms"] == 1 and final["shift_down"]["drifting"]
    assert final["shift_down"]["s_neg_cents"] > 100_000


def test_cusum_segmented_equals_window_form(spark, sf_dir):
    """The segmented two-pass CUSUM (time-bucketed local scans +
    driver-side exact carry chain — the >sf10 escape from the 5-task
    low-cardinality window ceiling) must match the shipped window-SQL
    form field-for-field, including with more buckets than rows per
    type (every bucket boundary becomes a carry)."""
    from data_collection_ieee_spark.operators.streaming_shaped import (
        _cusum_drift_segmented,
    )

    base = {
        r["event_type"]: tuple(r)
        for r in registry.QUERIES["events_cusum_drift"](spark, sf_dir).collect()
    }
    for nb in (64, 997):
        seg = {
            r["event_type"]: tuple(r)
            for r in _cusum_drift_segmented(spark, sf_dir, n_buckets=nb).collect()
        }
        assert seg == base, nb


def test_cusum_batch_query_equals_streaming_operator(spark, sf_dir):
    """The oracle-checked window-SQL form and the stateful streaming
    kernel implement the SAME recursion with the same constants: with a
    single micro-batch (arrival order == global event-time order) every
    field must match bit-exactly — integers all the way down."""
    batch = {
        r["event_type"]: r
        for r in registry.QUERIES["events_cusum_drift"](spark, sf_dir).collect()
    }
    from data_collection_ieee_spark.streaming import stateful

    events = parity.read_events_stream(spark, sf_dir)
    out = parity.run_to_memory(stateful.cusum_drift(events), mode="update").collect()
    assert {r["event_type"] for r in out} == set(batch)
    for r in out:
        b = batch[r["event_type"]]
        assert (
            r["n_seen"],
            r["s_pos_cents"],
            r["s_neg_cents"],
            r["n_alarms"],
            r["drifting"],
        ) == (
            b["n_events"],
            b["s_pos_cents"],
            b["s_neg_cents"],
            b["n_alarms"],
            b["drifting"],
        ), r["event_type"]


def test_cusum_invariant_under_arrow_chunking(spark, tmp_path):
    """Regression: the runner delivers a key's micro-batch rows as an
    iterator of Arrow chunks whose boundaries/order are execution
    artifacts. A chunk-local sort is not a global sort — with the
    shift pattern below, processing the high-value tail before the
    in-control head leaves the same alarm count but a collapsed final
    excursion (drifting flips to False). Force many tiny chunks via
    arrow.maxRecordsPerBatch and require the kernel's end state to be
    identical to the single-chunk run."""
    import datetime as dt

    import pandas as pd

    from data_collection_ieee_spark.streaming import stateful

    t0 = dt.datetime(2024, 1, 1)
    recs = []
    for i in range(300):
        recs.append(
            {
                "event_id": i,
                "ts": t0 + dt.timedelta(seconds=i),
                "user_id": i % 7,
                "event_type": "shift_up",
                "value": 50.0 if i < 100 else 90.0,
                "props": "{}",
            }
        )
    d = str(tmp_path / "sfchunk")
    os.makedirs(d)
    pd.DataFrame(recs).to_parquet(d + "/events.parquet", index=False)

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    results = {}
    try:
        for label, batch_rows in (("one_chunk", "100000"), ("tiny_chunks", "17")):
            spark.conf.set(key, batch_rows)
            events = parity.read_events_stream(
                spark, d, n_files=4, files_per_trigger=2
            )
            out = parity.run_to_memory(
                stateful.cusum_drift(events), mode="update"
            ).collect()
            final = max(out, key=lambda r: r["n_seen"])
            results[label] = (
                final["n_seen"],
                final["s_pos_cents"],
                final["s_neg_cents"],
                final["n_alarms"],
                final["drifting"],
            )
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)

    assert results["one_chunk"] == results["tiny_chunks"]
    assert results["one_chunk"][0] == 300
    assert results["one_chunk"][3] == 1 and results["one_chunk"][4] is True


def test_streaming_heavy_hitters_matches_reference_and_guarantee(spark, sf_dir):
    """Misra–Gries top talkers across 3 micro-batches must equal a
    pure-Python MG replay of the SAME arrival order (integer counters,
    exact match), AND keep the classic guarantee: every user whose true
    count exceeds n_seen/K appears among the candidates, with tracked
    counts lower-bounding truth by at most n_seen/K."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    from data_collection_ieee_spark.streaming import stateful

    events = parity.read_events_stream(spark, sf_dir, n_files=3, files_per_trigger=1)
    out = parity.run_to_memory(stateful.heavy_hitters(events), mode="update").collect()
    final = {}
    for r in out:
        if (
            r["event_type"] not in final
            or r["n_seen"] > final[r["event_type"]]["n_seen"]
        ):
            final[r["event_type"]] = r

    tbl = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    n = len(tbl["event_id"])
    rows = list(zip(tbl["ts"], tbl["event_id"], tbl["event_type"], tbl["user_id"]))
    step = math.ceil(n / 3)
    ref: dict[str, dict[int, int]] = {}
    truth: dict[str, Counter] = {}
    for b in range(3):
        chunk = sorted(rows[b * step : (b + 1) * step])  # (ts, event_id)
        for _ts, _eid, etype, uid in chunk:
            stateful._mg_merge(ref.setdefault(etype, {}), [uid])
            truth.setdefault(etype, Counter())[uid] += 1

    assert set(final) == set(ref)
    for etype, counters in ref.items():
        r = final[etype]
        n_seen = r["n_seen"]
        assert n_seen == sum(truth[etype].values())
        got = dict(zip(r["users"], r["lower_bounds"]))
        assert got == {int(u): int(c) for u, c in counters.items()}, etype
        # MG guarantees, vs exact truth:
        thresh = n_seen / stateful.HH_K
        for uid, true_cnt in truth[etype].items():
            if true_cnt > thresh:
                assert uid in got, (etype, uid)
            if uid in got:
                assert got[uid] <= true_cnt
                assert true_cnt - got[uid] <= thresh

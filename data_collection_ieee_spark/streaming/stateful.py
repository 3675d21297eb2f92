"""Custom stateful streaming operator (applyInPandasWithState).

The windowed/session operators in streaming_shaped.py cover everything
Spark's built-in stateful aggregations express. This module is the
escape hatch the survey calls for when they don't: arbitrary per-key
state carried across micro-batches, held in the state store
(checkpointable, evictable), updated with Arrow-batched pandas — the
pattern for running counters, online feature aggregates, or per-entity
anomaly trackers over an unbounded stream.

Operator here: per-user running totals (event count, value sum, last
event time). Every micro-batch emits each touched user's NEW running
totals — an incrementally-maintained per-user feature row. At 100 TB /
unbounded input the state is one tiny fixed-width row per user,
partitioned by the grouping key across executors; nothing ever rescans
history.

Verified in tests/test_streaming.py by replaying the events table in
MULTIPLE micro-batches (maxFilesPerTrigger=1 over a multi-file stage)
and asserting the final per-user state equals the batch groupBy — i.e.
state provably survives batch boundaries.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value_cents bigint, last_ts timestamp"
)
STATE_SCHEMA = "n bigint, cents bigint, last_us bigint"


def _update_user_state(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, cents, last_us = state.get if state.exists else (0, 0, None)
    for pdf in pdfs:
        n += len(pdf)
        # money in integer cents PER ROW before summing: each row's value
        # is independently rounded to a fixed integer, so the total is
        # associative and exact — invariant to how rows land in
        # micro-batches (rounding a per-batch float sum would make batch
        # boundaries observable: two batches at x.005 each round
        # differently than one combined batch). HALF_UP away from zero,
        # matching Spark's F.round, so batch vs stream agree bit-exactly.
        v = pdf["value"].to_numpy(dtype="float64") * 100.0
        cents += int((np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64").sum())
        ts_max = pdf["ts"].max()
        us = int(ts_max.value // 1000)  # pandas Timestamp ns -> µs
        last_us = us if last_us is None else max(last_us, us)
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value_cents": [cents],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state. Watermark
    bounds late data; NoTimeout keeps user state live for the stream's
    lifetime (swap for ProcessingTimeTimeout to expire idle users)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def idempotent_parquet_sink(stream_df: DataFrame, out_dir: str):
    """foreachBatch sink with exactly-once delivery on top of Spark's
    at-least-once batch replay: every micro-batch lands in its own
    `batch=<id>` directory guarded by a commit marker, so a re-delivered
    batch (task retry, query restart from checkpoint) is skipped instead
    of duplicated. This marker-file protocol is the minimal form of what
    transactional table formats do with a commit log; swap the body for
    a MERGE INTO on such a table in production — the foreachBatch shape
    is identical.

    Returns the DataStreamWriter (caller starts it with a trigger)."""
    return stream_df.writeStream.foreachBatch(make_batch_writer(out_dir))


def make_batch_writer(out_dir: str):
    """The foreachBatch body, exposed so tests can exercise the
    re-delivery guard directly."""
    import os

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(out_dir, exist_ok=True)
        marker = os.path.join(out_dir, f"_committed_{batch_id}")
        if os.path.exists(marker):
            return  # re-delivery: already durably written
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        with open(marker, "w"):
            pass

    return write_batch


# ---------------------------------------------------------------------------
# per-key CUSUM drift detector

# All thresholds in integer cents so every state transition is exact
# int64 arithmetic — bit-identical under any vectorization and immune
# to float-summation-order effects across micro-batch boundaries.
CUSUM_MU0_CENTS = 5_000  # in-control mean (µ0 = $50)
CUSUM_K_CENTS = 2_500  # slack k (~σ/2): drifts smaller than k are ignored
CUSUM_H_CENTS = 100_000  # alarm threshold h ($1000 cumulative excess)

CUSUM_OUTPUT_SCHEMA = (
    "event_type string, n_seen bigint, s_pos_cents bigint, s_neg_cents bigint, "
    "n_alarms bigint, drifting boolean"
)
CUSUM_STATE_SCHEMA = (
    "s_pos bigint, s_neg bigint, above_pos boolean, above_neg boolean, "
    "n_seen bigint, n_alarms bigint"
)


def _cusum_side(s0: int, d: "np.ndarray", was_above: bool):
    """One CUSUM side, vectorized but sequentially exact (int64):
    S_t = max(0, S_{t-1} + d_t) via the prefix-sum identity
    S_t = C_t − min(0, min_{j≤t} C_j), C_t = S_0 + Σ_{j≤t} d_j —
    identical to the per-row loop because integer addition is
    associative (no float rounding anywhere). Returns (final S,
    up-crossing count of h, final above flag)."""
    if len(d) == 0:
        return s0, 0, was_above
    c = s0 + np.cumsum(d, dtype="int64")
    s = c - np.minimum(np.minimum.accumulate(c), 0)
    above = s > CUSUM_H_CENTS
    prev = np.concatenate(([was_above], above[:-1]))
    crossings = int(np.count_nonzero(above & ~prev))
    return int(s[-1]), crossings, bool(above[-1])


def _update_cusum_state(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    s_pos, s_neg, above_pos, above_neg, n_seen, n_alarms = (
        state.get if state.exists else (0, 0, False, False, 0, 0)
    )
    # arrival order across micro-batches, event-time order within one
    # (event_id tiebreak): the only deterministic order a stream can
    # give an order-sensitive detector. The runner hands the key's
    # micro-batch rows as an ITERATOR of Arrow chunks whose boundaries
    # and relative order are execution artifacts (shuffle-read order),
    # so sorting chunk-by-chunk is NOT a global sort — a 90¢ chunk
    # processed before an earlier 50¢ chunk silently rewrites the
    # excursion path (observed: same n_alarms, flipped `drifting`).
    # Concatenate first, sort once. Memory bound = one key's rows in
    # one micro-batch, the same bound applyInPandasWithState already
    # imposes on state-op kernels.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        v = pdf["value"].to_numpy(dtype="float64") * 100.0
        cents = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")
        s_pos, c_pos, above_pos = _cusum_side(
            s_pos, cents - CUSUM_MU0_CENTS - CUSUM_K_CENTS, above_pos
        )
        s_neg, c_neg, above_neg = _cusum_side(
            s_neg, CUSUM_MU0_CENTS - cents - CUSUM_K_CENTS, above_neg
        )
        n_alarms += c_pos + c_neg
        n_seen += len(pdf)
    state.update((s_pos, s_neg, above_pos, above_neg, n_seen, n_alarms))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [n_seen],
            "s_pos_cents": [s_pos],
            "s_neg_cents": [s_neg],
            "n_alarms": [n_alarms],
            "drifting": [above_pos or above_neg],
        }
    )


def cusum_drift(events: DataFrame) -> DataFrame:
    """Streaming per-event-type CUSUM drift detector (Page 1954) with
    explicit cross-batch state: two one-sided cumulative sums catch
    sustained up/down shifts of the value stream away from the
    in-control mean — the online complement to the batch z-score query
    (`events_anomaly_zscore`), which needs the whole day before it can
    speak. `n_alarms` counts up-crossings of h (no reset — the sum
    itself documents the excursion); `drifting` is the live state.

    At 100 TB/unbounded: state is one 6-field row per key in the state
    store, partitioned by key across executors; per batch each key does
    one Arrow transfer + O(rows) int64 vector work. Nothing rescans
    history."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_cusum_state,
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---- Streaming heavy hitters (Misra–Gries top talkers) ----------------
#
# The streaming twin of the batch agg_heavy_hitters two-pass: per
# event_type, a K-counter Misra–Gries summary of the user_id stream is
# carried across micro-batches in the state store. The merged sketch
# keeps the classic guarantee ONLINE: any user with a true share above
# n_seen/K of that type's events so far is guaranteed to be among the
# tracked candidates, and each tracked count is a lower bound within
# n_seen/K of the truth — with O(K) state per key, forever, no matter
# how many distinct users flow past. The batch side's exact verify pass
# maps to a periodic lookup join in production; here the candidates ARE
# the deliverable (top-talker / abuse-detection shape).

HH_K = 64  # MG counters per event_type — state is O(K) per key
HH_OUTPUT_SCHEMA = (
    "event_type string, n_seen bigint, users array<bigint>, lower_bounds array<bigint>"
)
HH_STATE_SCHEMA = "users array<bigint>, counts array<bigint>, n_seen bigint"


def _mg_merge(counters: dict, stream) -> None:
    """Misra–Gries update of ``counters`` (≤ HH_K entries) in place."""
    for uid in stream:
        if uid in counters:
            counters[uid] += 1
        elif len(counters) < HH_K:
            counters[uid] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]


def _update_hh_state(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.exists:
        users, counts, n_seen = state.get
        counters = dict(zip(users, counts))
    else:
        counters, n_seen = {}, 0
    # same determinism rule as the CUSUM kernel: chunk boundaries are
    # execution artifacts, so concatenate the micro-batch and fix ONE
    # order (event time, event_id tiebreak) before the order-sensitive
    # sketch update
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        uids = pdf["user_id"].to_numpy(dtype="int64")
        _mg_merge(counters, uids.tolist())
        n_seen += len(uids)
    items = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
    state.update(
        ([int(u) for u, _ in items], [int(c) for _, c in items], n_seen)
    )
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [n_seen],
            "users": [[int(u) for u, _ in items]],
            "lower_bounds": [[int(c) for _, c in items]],
        }
    )


def heavy_hitters(events: DataFrame) -> DataFrame:
    """Streaming per-event-type heavy-hitter candidates (Misra–Gries,
    K=64) with counts carried across micro-batches — "which users
    dominate each event stream", live. Guarantees (pinned in
    tests/test_streaming.py): candidates ⊇ every user above the 1/K
    share of that type's stream so far; tracked counts are lower
    bounds undercounting by at most n_seen/K.

    At unbounded scale: state is two K-length int64 arrays + a counter
    per key in the state store; per micro-batch each key does one
    Arrow transfer and O(rows) dict work. No rescans, no growth."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_hh_state,
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""State-store scaling measurement for the stateful streaming kernels
(VERDICT r9 item 6).

The 100 TB claim for applyInPandasWithState operators is O(state keys)
state, independent of stream length — and for the sketch kernels,
O(1) state regardless of entity cardinality. This tool measures it:
replay a synthetic event stream with a controlled distinct-key count K
(1k → 100k users at FIXED row count) through

  - running_user_totals  (keyed by user_id: state rows must == K,
    state bytes ∝ K, wall ~flat at fixed rows), and
  - heavy_hitters        (keyed by event_type, Misra–Gries K=64 per
    type: state rows == |types| and state bytes must stay FLAT as the
    user cardinality grows 100x — that is the whole point of a
    bounded-memory sketch),

capturing the state store's own accounting (numRowsTotal /
memoryUsedBytes from the final StreamingQueryProgress) rather than
asserting it. Emits one JSON line per (op, K) and a BASELINE.md-ready
markdown table.

Round 13 (VERDICT r12 #8) adds two probes:
  --provider rocksdb    run the same sweep under
                        RocksDBStateStoreProvider instead of the
                        default HDFS-backed store (per-query conf, set
                        before each stream starts), so the two
                        providers' state accounting and walls can be
                        compared side by side in BASELINE.md.
  --recovery            measure the RESTART wall: phase 1 processes
                        half the staged files against a durable
                        checkpoint and stops; phase 2 restarts the
                        same query over the full directory — its wall
                        is checkpoint state reload + the remaining
                        batches, the number an on-call engineer cares
                        about after an executor loss.

Usage: SPARK_DRIVER_MEMORY=32g python tools/stream_statestore.py \
         [--rows 2000000] [--keys 1000 10000 100000] [--files 4] \
         [--provider hdfs|rocksdb] [--recovery]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from data_collection_ieee_spark.session import get_spark  # noqa: E402
from data_collection_ieee_spark.streaming import parity, stateful  # noqa: E402

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def synth_events(out_dir: str, n_rows: int, n_keys: int) -> str:
    """Deterministic events table with exactly n_keys distinct users
    (round-robin, so per-user row counts are equal and the only axis
    that moves between runs is key cardinality). Same schema the
    fixtures use, timestamps strictly increasing."""
    path = os.path.join(out_dir, f"k{n_keys}")
    os.makedirs(path, exist_ok=True)
    f = os.path.join(path, "events.parquet")
    if os.path.exists(f):
        return path
    rng = np.random.default_rng(42)
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = t0 + np.arange(n_rows, dtype=np.int64) * 1000  # 1 ms apart
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n_rows, dtype=np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(
                (np.arange(n_rows, dtype=np.int64) % n_keys)
            ),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[rng.integers(0, 5, n_rows)]
            ),
            "value": pa.array(np.round(rng.uniform(0, 100, n_rows), 2)),
            "props": pa.array(
                np.char.add(
                    np.char.add(
                        '{"k": ',
                        rng.integers(0, 100, n_rows).astype("U3"),
                    ),
                    "}",
                )
            ),
        }
    )
    pq.write_table(tbl, f, row_group_size=max(4096, n_rows // 32))
    return path


def run_capture(df, mode: str = "update") -> tuple[float, dict]:
    """Run a streaming frame to completion under availableNow; return
    (wall seconds, final state-operator progress metrics)."""
    name = f"statestore_{uuid.uuid4().hex[:12]}"
    t0 = time.time()
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    ops: dict = {}
    for p in q.recentProgress:
        prog = json.loads(p.json) if hasattr(p, "json") else dict(p)
        if prog.get("stateOperators"):
            ops = prog["stateOperators"][0]  # keep the LAST one seen
    q.stop()
    return wall, ops


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def run_recovery(spark, build, src_file: str, out_dir: str, tag: str) -> dict:
    """Restart-from-checkpoint wall (VERDICT r12 #8): phase 1 streams
    the first half of the files against a durable checkpoint and
    terminates; phase 2 drops the second half into the source dir and
    restarts the SAME query — its wall covers provider state reload
    plus the remaining batches. Returns both walls so the provider
    comparison can separate reload cost from steady processing."""
    import shutil

    from data_collection_ieee_spark.catalog import normalize_events_ts
    from data_collection_ieee_spark.streaming import stateful as _st

    work = os.path.join(out_dir, f"recovery_{tag}_{uuid.uuid4().hex[:8]}")
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")
    sink = os.path.join(work, "sink")
    os.makedirs(src, exist_ok=True)
    tbl = pq.read_table(src_file)
    n_files = 4
    step = (tbl.num_rows + n_files - 1) // n_files
    chunks = [tbl.slice(i * step, step) for i in range(n_files)]
    now = time.time()
    for i, c in enumerate(chunks[:2]):
        p = os.path.join(src, f"events_{i:03d}.parquet")
        pq.write_table(c, p)
        os.utime(p, (now + i, now + i))  # strictly increasing mtimes

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src).schema

    def stream_df():
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return normalize_events_ts(raw)

    def start():
        # the memory sink forbids checkpoint recovery; the repo's
        # idempotent foreachBatch parquet sink is the production
        # delivery path (same pattern as
        # test_stateful_checkpoint_resume_across_restarts)
        return (
            _st.idempotent_parquet_sink(build(stream_df()), sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    t0 = time.time()
    q = start()
    q.awaitTermination()
    phase1 = time.time() - t0
    q.stop()
    for i, c in enumerate(chunks[2:], start=2):
        p = os.path.join(src, f"events_{i:03d}.parquet")
        pq.write_table(c, p)
        os.utime(p, (now + i, now + i))
    t0 = time.time()
    q = start()
    q.awaitTermination()
    recovery = time.time() - t0
    q.stop()
    shutil.rmtree(work, ignore_errors=True)
    return {"phase1_wall_s": round(phase1, 3), "recovery_wall_s": round(recovery, 3)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--keys", type=int, nargs="*", default=[1000, 10000, 100000])
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--out", default="/tmp/dcis_statestore")
    ap.add_argument("--provider", choices=["hdfs", "rocksdb"], default="hdfs")
    ap.add_argument("--recovery", action="store_true")
    args = ap.parse_args()

    spark = get_spark("stream-statestore")
    if args.provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER
        )
    recs = []
    for n_keys in args.keys:
        sf_dir = synth_events(args.out, args.rows, n_keys)
        for op_name, build in (
            ("running_user_totals", stateful.running_user_totals),
            ("heavy_hitters", stateful.heavy_hitters),
        ):
            events = parity.read_events_stream(
                spark, sf_dir, n_files=args.files, files_per_trigger=1
            )
            build(events)  # warm plan resolution only; cheap
            wall, ops = run_capture(build(
                parity.read_events_stream(
                    spark, sf_dir, n_files=args.files, files_per_trigger=1
                )
            ))
            rec = {
                "op": op_name,
                "n_keys": n_keys,
                "rows": args.rows,
                "micro_batches": args.files,
                "provider": args.provider,
                "wall_s": round(wall, 3),
                "state_rows": ops.get("numRowsTotal"),
                "state_bytes": ops.get("memoryUsedBytes"),
            }
            if args.recovery:
                rec.update(
                    run_recovery(
                        spark,
                        build,
                        os.path.join(sf_dir, "events.parquet"),
                        args.out,
                        f"{op_name}_{n_keys}_{args.provider}",
                    )
                )
            recs.append(rec)
            print(json.dumps(rec), flush=True)

    # None-safe: a degenerate run can leave recentProgress without
    # stateOperators metrics, and '{None:,}' would TypeError AFTER the
    # whole measurement already ran (ADVICE r10)
    def fmt(v):
        return f"{v:,}" if isinstance(v, int) else "n/a"

    hdr = "| op | provider | distinct keys | state rows | state bytes | wall s |"
    cols = 6
    if args.recovery:
        hdr = hdr[:-1] + " phase1 s | recovery s |"
        cols += 2
    print("\n" + hdr)
    print("|" + "---|" * cols)
    for r in recs:
        line = (
            f"| {r['op']} | {r['provider']} | {fmt(r['n_keys'])} "
            f"| {fmt(r['state_rows'])} | {fmt(r['state_bytes'])} | {r['wall_s']} |"
        )
        if args.recovery:
            line += f" {r['phase1_wall_s']} | {r['recovery_wall_s']} |"
        print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Schema-drift canary (VERDICT r3 action #5).

The driver regenerates /root/testdata between rounds and has already
changed `events.ts`'s parquet encoding once (TIMESTAMP(NANOS) in rounds
1-2 → TIMESTAMP(MICROS)/NTZ in round 3), which silently broke four
queries, the bench, and five streaming tests at once. This module pins
the NORMALIZED dtypes every operator relies on, so the next encoding
drift fails loudly in exactly one place instead of as scattered
AnalysisExceptions.

Policy encoded here:
- `events.ts` must arrive as plain `timestamp` after
  `catalog.normalize_events_ts` — that is the invariant all
  `unix_micros`/window/session consumers assume.
- `o_orderdate` / `l_shipdate` may be `timestamp` or `timestamp_ntz`:
  no operator applies an encoding-sensitive function to them (verified
  by grep for unix_* / *_utc_* call sites), and both decode to the same
  wall-clock values under the pinned-UTC session.
- Join/group keys must stay integral, measures double, text string —
  a silent int32/int64 or decimal flip would shift oracle hash parity.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import TABLE_NAMES, load_table, normalize_events_ts

# column -> allowed Spark simpleString dtypes after catalog normalization
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int", "bigint"}, "r_name": {"string"}},
    "nation": {
        "n_nationkey": {"int", "bigint"},
        "n_name": {"string"},
        "n_regionkey": {"int", "bigint"},
    },
    "customer": {
        "c_custkey": {"bigint"},
        "c_name": {"string"},
        "c_nationkey": {"int", "bigint"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": {"bigint"},
        "s_name": {"string"},
        "s_nationkey": {"int", "bigint"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"bigint"},
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": {"int", "bigint"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"bigint"},
        "o_custkey": {"bigint"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp", "timestamp_ntz"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"bigint"},
        "l_partkey": {"bigint"},
        "l_suppkey": {"bigint"},
        "l_linenumber": {"int", "bigint"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"timestamp", "timestamp_ntz"},
    },
    "events": {
        "event_id": {"bigint"},
        "ts": {"timestamp"},  # the hard invariant — see module docstring
        "user_id": {"bigint"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"bigint"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"bigint", "int"},
    },
    "embeddings": {
        "vec_id": {"bigint"},
        "embedding": {"array<float>", "array<double>"},
        "label": {"int", "bigint"},
    },
}


def assert_normalized(name: str, dtypes: dict[str, str]) -> None:
    spec = EXPECTED[name]
    missing = set(spec) - set(dtypes)
    assert not missing, f"{name}: columns missing from testdata: {sorted(missing)}"
    bad = {
        col: dtypes[col]
        for col, allowed in spec.items()
        if dtypes[col] not in allowed
    }
    assert not bad, (
        f"{name}: dtype drift after catalog normalization: {bad} "
        f"(allowed: { {c: sorted(spec[c]) for c in bad} }) — the driver "
        "likely re-encoded the testdata; extend catalog normalization."
    )


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_normalized_dtypes(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    assert_normalized(name, dict(df.dtypes))


def test_events_ts_all_encodings_normalize(spark, tmp_path):
    """All three parquet timestamp encodings the driver has shipped (or
    could ship) decode to identical TIMESTAMP values via the catalog."""
    micros = [1_704_067_200_000_000, 1_704_070_800_500_000]  # 2024-01-01 UTC
    variants = {
        "nanos": pa.table({"ts": pa.array([m * 1000 for m in micros], pa.timestamp("ns"))}),
        "ntz_micros": pa.table({"ts": pa.array(micros, pa.timestamp("us"))}),
        "utc_micros": pa.table({"ts": pa.array(micros, pa.timestamp("us", tz="UTC"))}),
    }
    decoded = {}
    for label, tbl in variants.items():
        path = os.path.join(tmp_path, f"{label}.parquet")
        pq.write_table(tbl, path)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_events_ts(spark.read.parquet(path))
        assert dict(df.dtypes)["ts"] == "timestamp", f"{label} not normalized"
        decoded[label] = [r["ts"] for r in df.orderBy("ts").collect()]
    assert decoded["nanos"] == decoded["ntz_micros"] == decoded["utc_micros"]


def test_mistyped_fixture_fails_loudly(spark):
    """A deliberately wrong encoding must FAIL the canary, not coast."""
    df = spark.range(1).select(
        F.col("id").alias("event_id"),
        F.lit("2024-01-01T00:00:00").alias("ts"),  # string-typed ts
        F.col("id").alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    normalized = normalize_events_ts(df)
    with pytest.raises(AssertionError, match="dtype drift"):
        assert_normalized("events", dict(normalized.dtypes))

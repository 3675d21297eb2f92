"""Differential-testing utilities: Spark result vs DuckDB oracle.

Canonicalizes both result sets to order-insensitive multisets of
stringified rows (columns sorted by name) — a strict local proxy for
the driver's row-count + schema + value-hash gate, so anything passing
here should hash-match driver-side.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb

from data_collection_ieee_spark.catalog import TABLE_NAMES


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with each test table registered as a view,
    mirroring the driver's setup."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 3.0 vs 3 across engines
        return repr(v)
    if isinstance(v, Decimal):
        return canon_cell(float(v))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_rows(cols, rows) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Return a list of problems (empty = equivalent)."""
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    problems: list[str] = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
    if not problems:
        cs = canon_rows(spark_cols, spark_rows)
        cd = canon_rows(duck_cols, duck_rows)
        if cs != cd:
            diffs = [(a, b) for a, b in zip(cs, cd) if a != b]
            msg = (
                f"{len(diffs)} mismatched rows; first: spark={diffs[0][0]} duck={diffs[0][1]}"
                if diffs
                else "row multisets differ"
            )
            problems.append(msg)
    return problems

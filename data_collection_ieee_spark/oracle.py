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
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"  # distinct from NULL: a NaN-vs-NULL drift must fail
        if math.isinf(v):
            return "+inf" if v > 0 else "-inf"
        return repr(v)  # shortest round-trip; NO int collapse (3.0 != 3)
    if isinstance(v, Decimal):
        if v.is_nan():
            return "NaN"
        # exact decimal canonical form, no lossy float round-trip; tagged
        # so a decimal-vs-double drift fails locally like it would driver-side
        return f"dec:{v.normalize()}"
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


# Numeric families: the driver's value hash serializes by physical type,
# so an int-width or int-vs-float-vs-decimal drift fails driver-side even
# when the values are numerically equal (seen round 1: DuckDB widening
# SUM(BIGINT) to HUGEINT). Mirror that strictness here via DESCRIBE.
_DUCK_INT_WIDTH = {"TINYINT": 8, "SMALLINT": 16, "INTEGER": 32, "BIGINT": 64}
_SPARK_INT_WIDTH = {"tinyint": 8, "smallint": 16, "int": 32, "bigint": 64}
_DUCK_FLOAT = {"FLOAT", "REAL", "DOUBLE"}
_SPARK_FLOAT = {"float", "double"}


def oracle_type_problems(spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Flag physical-type drift between the Spark schema and the DuckDB
    oracle's output schema that would break the driver's value hash:
    HUGEINT anywhere, int-width mismatch, int/float/decimal family swap."""
    try:
        desc = con.execute(f"DESCRIBE (\n{oracle}\n)").fetchall()
    except Exception as e:  # noqa: BLE001
        return [f"DESCRIBE failed: {e}"]
    duck_types = {r[0]: r[1].upper() for r in desc}
    spark_types = dict(spark_df.dtypes)
    problems = []
    for col, dt_ in duck_types.items():
        if "HUGEINT" in dt_:
            problems.append(f"oracle col {col} is {dt_} — CAST(... AS BIGINT) it")
            continue
        st = spark_types.get(col)
        if st is None or "[" in dt_ or "(" in dt_ or st.startswith(("array", "map", "struct", "decimal")):
            continue  # nested/decimal widths checked by value canon, not here
        dw, sw = _DUCK_INT_WIDTH.get(dt_), _SPARK_INT_WIDTH.get(st)
        if dw is not None or sw is not None:
            if dw != sw:
                problems.append(f"col {col}: oracle {dt_} vs spark {st} (int-width/family drift)")
            continue
        if (dt_ in _DUCK_FLOAT) != (st in _SPARK_FLOAT):
            problems.append(f"col {col}: oracle {dt_} vs spark {st} (float-family drift)")
    return problems


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Return a list of problems (empty = equivalent)."""
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    problems: list[str] = list(oracle_type_problems(spark_df, con, oracle))
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

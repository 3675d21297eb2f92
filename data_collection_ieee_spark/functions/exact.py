"""Exact (order-independent) numeric helpers for oracle-hash determinism.

Double-precision summation is not associative, so Spark and DuckDB can
legitimately disagree in the last bits when they add partitions in a
different order. Every money/measure aggregate in the engine therefore
routes through fixed-point DECIMAL arithmetic — exact and
order-independent — and is cast back to DOUBLE only at the very end.
Both the Spark expression and the oracle SQL apply the *same* casts, so
the final doubles are bit-identical.

This is also the right call at 100 TB: decimal sums neither overflow
silently nor drift, and Spark's decimal aggregates stay inside
whole-stage codegen (no UDF involved).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for TPC-H-style money values (< 10^10) at any SF; scale 2
# matches the 2-decimal test data.
MONEY = "decimal(12,2)"
RATE = "decimal(4,2)"  # discount / tax fractions in [0, 1)


def dec(col: Column | str, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: Column | str, typ: str = MONEY) -> Column:
    """Order-independent SUM: decimal-sum, then back to double."""
    return F.sum(dec(col, typ)).cast("double")


def davg(col: Column | str, typ: str = MONEY) -> Column:
    """Order-independent AVG as decimal-sum / count (double division)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, typ)).cast("double") / F.count(c)


def sql_dsum(expr: str, typ: str = "DECIMAL(12,2)") -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE)"


def sql_davg(expr: str, typ: str = "DECIMAL(12,2)") -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) / COUNT({expr})"

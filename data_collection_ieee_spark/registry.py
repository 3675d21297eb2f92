"""Query registry — the single source of truth for the driver contract.

Every engine operator registers here with BOTH its PySpark callable and
(when SQL-expressible) its DuckDB oracle SQL, so the two can never drift
apart. ``__spark_entry__.py`` simply re-exports these dicts.

Determinism conventions (shared by the Spark side and the oracle side so
the driver's order-insensitive value hash matches bit-for-bit):

- Money/measure sums go through DECIMAL casts (exact, order-independent
  arithmetic) and are cast back to DOUBLE at the end; double summation
  order differs between engines and would flake the hash.
- Averages are computed as decimal-sum / count, not AVG(double).
- ORDER BY semantics are encoded as an explicit rank/row_number column,
  because the driver hash is order-insensitive.
- Approximate operators (HLL, approx quantiles) register NO oracle (the
  driver then applies its weaker rows-only check) or an exactness-free
  tolerance form.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# oracles registered as zero-arg callables, resolved by load_all() AFTER
# every module has imported — lets an oracle compose other operators'
# registered SQL without import-order coupling between operator modules
_LAZY_ORACLES: dict[str, Callable[[], str]] = {}


def query(
    name: str, oracle: Optional[str | Callable[[], str]] = None
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; optionally its oracle SQL.

    ``oracle`` may be a SQL string, or a zero-arg callable returning one
    — callables are resolved at the end of :func:`load_all`, after all
    operator modules have registered, so a composed oracle may reference
    any other query's ORACLES entry regardless of module import order.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if callable(oracle):
            _LAZY_ORACLES[name] = oracle
        elif oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run (idempotent)."""
    from data_collection_ieee_spark.operators import (  # noqa: F401
        aggregates,
        articles_queries,
        dedup,
        graph,
        joins,
        multimodal,
        pipeline,
        scalar_funcs,
        scans,
        selections,
        similarity,
        sorting,
        stats,
        streaming_shaped,
        text_analysis,
        tpch,
        udfs,
        windows,
    )

    # Resolve composed oracles now that every module has registered
    # (idempotent: each callable is popped once; results are plain SQL).
    # Resolution runs in REGISTRATION order so a lazy oracle may read an
    # earlier lazy oracle's resolved ORACLES entry (r7 ADVICE: popitem()
    # resolved in arbitrary order, a latent bug with >1 lazy oracle).
    for qname in list(_LAZY_ORACLES):
        thunk = _LAZY_ORACLES.pop(qname)
        ORACLES[qname] = thunk().strip()

"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`data_collection_ieee_spark.registry` — every
operator registers its PySpark callable and DuckDB oracle SQL together
(one decorator site per operator), so `queries()` and `oracle_sql()`
cannot drift apart.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_collection_ieee_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return registry.QUERIES["agg_hash_group"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; approximate/non-SQL ops omitted
    (driver then applies its weaker rows-only check)."""
    return dict(registry.ORACLES)

"""Differential tests: every registered query vs its DuckDB oracle.

This is the same comparison the driver applies (row count + schema +
order-insensitive value multiset), run at sf0.001 for speed. Queries
without an oracle are smoke-checked (runs, stable schema, ≥0 rows).
"""

from __future__ import annotations

import pytest

from data_collection_ieee_spark import oracle as orc
from data_collection_ieee_spark import registry

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    sql = registry.ORACLES.get(name)
    if sql is None:
        rows = df.collect()
        assert rows is not None
        assert len(df.columns) > 0
    else:
        problems = orc.compare(df, duck, sql)
        assert not problems, f"{name}: {problems}"

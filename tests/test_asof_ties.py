"""Regression tests for as-of join timestamp-tie semantics.

Both as-of oracles are INCLUSIVE at the boundary (c.ts <= p.ts /
p.ts >= c.ts), so a click and purchase at the identical timestamp must
match.  Round-1 advice found join_asof_forward dropped the same-ts
purchase because the descending scan ordered clicks before purchases at
equal ts; these tests pin the fixed ordering with a synthetic events
table containing exact ties.
"""

from __future__ import annotations

import datetime as dt

import pytest

from data_collection_ieee_spark.operators import joins  # noqa: F401 (registers)
from data_collection_ieee_spark import registry


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_asof_forward_same_ts_purchase_matches(spark, tmp_path):
    """click@T / purchase@T → inclusive match (the round-1 bug)."""
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, TS, 7, "click", 0.0, None),
            (2, TS, 7, "purchase", 1.0, None),
        ],
    )
    out = registry.QUERIES["join_asof_forward"](spark, sf).collect()
    assert len(out) == 1
    assert out[0].click_id == 1 and out[0].purchase_id == 2


def test_asof_forward_equal_ts_lowest_purchase_id_wins(spark, tmp_path):
    """Two purchases at the same ts ≥ click: oracle picks lowest id."""
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, TS, 7, "click", 0.0, None),
            (5, TS + dt.timedelta(seconds=10), 7, "purchase", 1.0, None),
            (3, TS + dt.timedelta(seconds=10), 7, "purchase", 1.0, None),
        ],
    )
    out = registry.QUERIES["join_asof_forward"](spark, sf).collect()
    assert len(out) == 1
    assert out[0].purchase_id == 3


def test_asof_backward_same_ts_click_matches(spark, tmp_path):
    """purchase@T / click@T → inclusive match, highest click id on ties."""
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, TS, 7, "click", 0.0, None),
            (4, TS, 7, "click", 0.0, None),
            (2, TS, 7, "purchase", 1.0, None),
        ],
    )
    out = registry.QUERIES["join_asof"](spark, sf).collect()
    assert len(out) == 1
    assert out[0].purchase_id == 2 and out[0].click_id == 4


@pytest.mark.parametrize("name", ["join_asof", "join_asof_forward"])
def test_asof_tie_fixture_matches_oracle(spark, tmp_path, name):
    """Differential check on a tie-dense fixture: every event at one of
    3 timestamps, so boundary handling dominates the result."""
    import duckdb

    rows = []
    eid = 0
    for u in range(4):
        for k, t_off in [(0, 0), (1, 0), (0, 60), (1, 60), (1, 120), (0, 120)]:
            eid += 1
            rows.append(
                (
                    eid,
                    TS + dt.timedelta(seconds=t_off),
                    u,
                    "purchase" if k else "click",
                    float(k),
                    None,
                )
            )
    sf = _write_events(spark, tmp_path, rows)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    from data_collection_ieee_spark import oracle as orc

    problems = orc.compare(
        registry.QUERIES[name](spark, sf), con, registry.ORACLES[name]
    )
    assert problems == [], problems

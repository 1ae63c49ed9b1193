"""Conversion attribution (operators/attribution.py): literal
first/last-touch pins, direct-conversion sentinel, one-conversion-per-
session, session isolation, and oracle parity."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.attribution import (
    attribution_oracle_sql,
    conversion_attribution,
)

T0 = datetime(2024, 1, 1)
GAP = 1800


def _events(spark, spec):
    """spec: (user, session_slot, [types in order])."""
    rows = []
    eid = 0
    for user, slot, types in spec:
        base = T0 + timedelta(seconds=slot * 10 * GAP)
        for j, t in enumerate(types):
            rows.append(
                (eid, base + timedelta(seconds=j), user, t, 1.0, None)
            )
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _get(spark, spec):
    return {
        (r.model, r.touch_type): r.conversions
        for r in conversion_attribution(_events(spark, spec)).collect()
    }


class TestAttribution:
    def test_literal_first_and_last_touch(self, spark):
        got = _get(
            spark,
            [(1, 0, ["view", "click", "purchase"])],
        )
        assert got == {
            ("first_touch", "view"): 1,
            ("last_touch", "click"): 1,
        }

    def test_direct_conversion(self, spark):
        # purchase opens the session -> last_touch = (direct),
        # first_touch = the purchase itself.
        got = _get(spark, [(1, 0, ["purchase", "view"])])
        assert got == {
            ("first_touch", "purchase"): 1,
            ("last_touch", "(direct)"): 1,
        }

    def test_one_conversion_per_session(self, spark):
        # two purchases in one session count once, attributed to the
        # FIRST purchase's predecessors.
        got = _get(
            spark,
            [(1, 0, ["click", "purchase", "view", "purchase"])],
        )
        assert got == {
            ("first_touch", "click"): 1,
            ("last_touch", "click"): 1,
        }

    def test_non_converting_sessions_drop(self, spark):
        got = _get(
            spark,
            [(1, 0, ["view", "click"]), (1, 1, ["signup", "purchase"])],
        )
        assert got == {
            ("first_touch", "signup"): 1,
            ("last_touch", "signup"): 1,
        }

    def test_sessions_attribute_independently(self, spark):
        got = _get(
            spark,
            [
                (1, 0, ["view", "purchase"]),
                (1, 1, ["click", "purchase"]),
                (2, 0, ["view", "purchase"]),
            ],
        )
        assert got[("first_touch", "view")] == 2
        assert got[("first_touch", "click")] == 1
        assert got[("last_touch", "view")] == 2

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            conversion_attribution(
                _events(spark, [(1, 0, ["view"])]), gap_seconds=0
            )


def test_oracle_parity_sf0001(spark):
    path = "/root/testdata/sf0.001/events.parquet"
    got = [
        tuple(r)
        for r in conversion_attribution(
            spark.read.parquet(path)
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')"
    )
    want = con.execute(attribution_oracle_sql()).fetchall()
    assert got == want and len(got) > 0

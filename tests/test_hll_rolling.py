"""Rolling-window distinct via mergeable daily HLL registers
(operators/sketches.py:hll_rolling_distinct)."""

from __future__ import annotations

from datetime import datetime

import duckdb

from eventhub_to_timescale_spark.operators.sketches import (
    hll_rolling_distinct,
    hll_rolling_oracle_sql,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, user_id long"
    )


def _d(day, hour=0):
    return datetime(2024, 1, day, hour)


class TestHllRollingDistinct:
    def test_trailing_window_semantics_exact_branch(self, spark):
        """Small cardinalities land in the linear-counting regime, so
        the estimate is near-exact AND the exact branch must implement
        the trailing-window union correctly: day 3's window (w=2)
        counts day 2 ∪ day 3 users, not day 1's."""
        rows = [
            (1, _d(1), "t", 100),
            (2, _d(2), "t", 200),
            (3, _d(2), "t", 201),
            (4, _d(3), "t", 200),   # repeat of day-2 user
            (5, _d(3), "t", 300),
        ]
        got = {
            r["day"].isoformat(): (r["exact_distinct"], r["within_tolerance"])
            for r in hll_rolling_distinct(
                _events(spark, rows), window_days=2
            ).collect()
        }
        assert got["2024-01-01"] == (1, True)
        assert got["2024-01-02"] == (3, True)   # {100, 200, 201}
        assert got["2024-01-03"] == (3, True)   # {200, 201, 300}

    def test_gap_days_do_not_leak_stale_registers(self, spark):
        """A day outside the trailing window contributes nothing even
        when no intermediate day has data for its buckets."""
        rows = [
            (1, _d(1), "t", 1),
            (2, _d(1), "t", 2),
            (3, _d(9), "t", 3),  # 8 days later, window_days=7
        ]
        got = {
            r["day"].isoformat(): r["exact_distinct"]
            for r in hll_rolling_distinct(
                _events(spark, rows), window_days=7
            ).collect()
        }
        assert got["2024-01-01"] == 2
        assert got["2024-01-09"] == 1

    def test_matches_duckdb_oracle(self, spark):
        rows = [
            (i, _d(1 + i % 10, i % 24), f"t{i % 3}", (i * 7) % 40)
            for i in range(200)
        ]
        got = sorted(
            (r["event_type"], r["day"].isoformat(), r["exact_distinct"],
             r["within_tolerance"])
            for r in hll_rolling_distinct(_events(spark, rows)).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, "
            "event_type VARCHAR, user_id BIGINT)"
        )
        con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
        want = sorted(
            (t, d.isoformat(), n, w)
            for t, d, n, w in con.execute(hll_rolling_oracle_sql()).fetchall()
        )
        assert got == want

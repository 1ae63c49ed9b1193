"""Classical seasonal decomposition (operators/seasonal.py)."""

from __future__ import annotations

from datetime import datetime, timezone

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.seasonal import (
    seasonal_decompose,
    seasonal_decompose_oracle_sql,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def _ts(h):
    return datetime(2024, 1, 1, h % 24, 0, 0, tzinfo=timezone.utc).replace(
        tzinfo=None
    ) if h < 24 else datetime(
        2024, 1, 1 + h // 24, h % 24, 0, 0
    )


class TestSeasonalDecompose:
    def test_pure_seasonal_signal_recovered(self, spark):
        """A perfectly periodic signal (period 4, zero trend slope)
        decomposes into a flat trend and the exact repeating seasonal
        pattern, with ~zero residual."""
        pattern = [10.0, 20.0, 30.0, 40.0]  # mean 25
        rows = [
            (h, _ts(h), "t", pattern[h % 4]) for h in range(16)
        ]
        got = {
            r["bucket"].hour + 24 * (r["bucket"].day - 1): r
            for r in seasonal_decompose(
                _events(spark, rows), period=4
            ).collect()
        }
        # trend defined for h in [2, 13] (5-point centered window)
        assert got[0]["trend"] is None and got[15]["trend"] is None
        for h in range(2, 14):
            assert got[h]["trend"] == pytest.approx(25.0)
            assert got[h]["seasonal"] == pytest.approx(
                pattern[h % 4] - 25.0
            )
            assert got[h]["residual"] == pytest.approx(0.0)

    def test_within_bucket_mean(self, spark):
        """Multiple events in one bucket average (micro-exact) before
        decomposition."""
        rows = [
            (1, _ts(0), "t", 9.0),
            (2, _ts(0), "t", 11.0),  # bucket 0 → 10.0
            (3, _ts(1), "t", 20.0),
        ]
        got = sorted(
            seasonal_decompose(_events(spark, rows), period=2).collect(),
            key=lambda r: r["bucket"],
        )
        assert got[0]["value"] == pytest.approx(10.0)
        assert got[1]["value"] == pytest.approx(20.0)

    def test_odd_period_plain_ma(self, spark):
        """Odd period → plain period-point mean (already
        phase-balanced), matching the oracle."""
        pattern = [6.0, 12.0, 18.0]  # period 3, mean 12
        rows = [(h, _ts(h), "t", pattern[h % 3]) for h in range(12)]
        df = _events(spark, rows)
        got = {
            r["bucket"].hour + 24 * (r["bucket"].day - 1): r
            for r in seasonal_decompose(df, period=3).collect()
        }
        for h in range(1, 11):
            assert got[h]["trend"] == pytest.approx(12.0)
            assert got[h]["seasonal"] == pytest.approx(
                pattern[h % 3] - 12.0
            )
            assert got[h]["residual"] == pytest.approx(0.0)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events "
            "(event_id BIGINT, ts TIMESTAMP, event_type VARCHAR, value DOUBLE)"
        )
        con.executemany(
            "INSERT INTO events VALUES (?, ?, ?, ?)", rows
        )
        want = sorted(
            tuple(
                v.isoformat() if hasattr(v, "isoformat") else v
                for v in r
            )
            for r in con.execute(
                seasonal_decompose_oracle_sql(period=3)
            ).fetchall()
        )
        s = sorted(
            tuple(
                v.isoformat() if hasattr(v, "isoformat") else v
                for v in r
            )
            for r in seasonal_decompose(df, period=3).collect()
        )
        assert s == want

    def test_bad_period_raises(self, spark):
        with pytest.raises(ValueError):
            seasonal_decompose(_events(spark, []), period=1)

    def test_matches_duckdb_oracle_hourly(self, spark):
        """Cross-engine byte parity on an irregular multi-type series
        (NULL values dropped, ragged series edges)."""
        import math

        rows = []
        eid = 0
        for h in range(60):
            for typ in ("a", "b"):
                eid += 1
                val = (
                    None
                    if (h + eid) % 13 == 0
                    else round(
                        50 + 30 * math.sin(h / 3.0) + (eid % 7), 3
                    )
                )
                rows.append((eid, _ts(h), typ, val))
        df = _events(spark, rows)
        got = sorted(
            tuple(
                v.isoformat() if hasattr(v, "isoformat") else v
                for v in r
            )
            for r in seasonal_decompose(df).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events "
            "(event_id BIGINT, ts TIMESTAMP, event_type VARCHAR, value DOUBLE)"
        )
        con.executemany(
            "INSERT INTO events VALUES (?, ?, ?, ?)",
            [(r[0], r[1], r[2], r[3]) for r in rows],
        )
        want = sorted(
            tuple(
                v.isoformat() if hasattr(v, "isoformat") else v
                for v in r
            )
            for r in con.execute(seasonal_decompose_oracle_sql()).fetchall()
        )
        assert got == want

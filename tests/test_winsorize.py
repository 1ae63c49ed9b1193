"""Winsorized robust stats (operators/winsorize.py): literal order-
statistic bounds, clip counts, outlier robustness, and oracle parity."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.winsorize import (
    winsorize_oracle_sql,
    winsorized_stats,
)

T0 = datetime(2024, 1, 1)


def _events(spark, values, etype="a"):
    rows = [
        (i, T0 + timedelta(minutes=i), 0, etype, float(v), None)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


class TestWinsorizedStats:
    def test_literal_bounds_and_clip_counts(self, spark):
        # 20 values 1..20; q=[0.1, 0.9] -> lo = 2nd smallest = 2,
        # hi = 18th smallest = 18; values 1 and 19,20 get clipped.
        df = _events(spark, range(1, 21))
        row = winsorized_stats(df, 0.1, 0.9).collect()[0]
        assert row.lo_cents == 200
        assert row.hi_cents == 1800
        assert row.n_clipped_lo == 1
        assert row.n_clipped_hi == 2
        # winsorized values: 2,2..18,18,18 -> sum = 210-1-19-20+2+18+18
        want_sum = sum([2] + list(range(2, 19)) + [18, 18])
        assert row.wmean == pytest.approx(want_sum / 20)

    def test_outlier_robustness(self, spark):
        # One absurd spike barely moves the winsorized mean.
        base = [10.0] * 99
        clean = winsorized_stats(_events(spark, base + [10.0])).collect()[0]
        spiked = winsorized_stats(_events(spark, base + [1e9])).collect()[0]
        assert clean.wmean == pytest.approx(10.0)
        assert spiked.wmean == pytest.approx(10.0, abs=0.01)
        assert spiked.n_clipped_hi == 1

    def test_groups_independent(self, spark):
        df = _events(spark, range(10), "a").union(
            _events(spark, range(100, 120), "b")
        )
        rows = {r.event_type: r for r in winsorized_stats(df).collect()}
        assert set(rows) == {"a", "b"}
        assert rows["a"].hi_cents < rows["b"].lo_cents

    def test_quantile_validation(self, spark):
        df = _events(spark, [1.0, 2.0])
        with pytest.raises(ValueError):
            winsorized_stats(df, 0.9, 0.1)
        with pytest.raises(ValueError):
            winsorized_stats(df, 0.0, 0.9)


def test_oracle_parity_sf0001(spark):
    path = "/root/testdata/sf0.001/events.parquet"
    got = [
        tuple(r)
        for r in winsorized_stats(spark.read.parquet(path)).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')"
    )
    want = con.execute(winsorize_oracle_sql()).fetchall()
    assert got == want

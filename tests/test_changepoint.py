"""CUSUM change-point detection (operators/changepoint.py): the
reflected-running-sum identity against a literal per-row Python fold,
a planted mean shift, and cross-engine oracle parity."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.changepoint import (
    cusum_alarms,
    cusum_alarms_oracle_sql,
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


def _fold_alarms(values, kappa, h):
    """Literal Page recursion in cents — the definition the window
    identity must reproduce."""
    cents = [round(v * 100) for v in values]
    n, s = len(cents), sum(cents)
    mu = (2 * s + n) // (2 * n)
    out = []
    s_up = s_dn = 0
    for i, v in enumerate(cents):
        s_up = max(0, s_up + (v - mu - kappa))
        s_dn = max(0, s_dn + (mu - v - kappa))
        if s_up > h:
            out.append((i, "up"))
        if s_dn > h:
            out.append((i, "down"))
    return out


class TestCusum:
    def test_matches_literal_page_recursion(self, spark):
        import random

        rng = random.Random(11)
        values = [rng.uniform(0, 50) for _ in range(200)]
        values[120:] = [v + 40 for v in values[120:]]  # planted shift
        kappa, h = 500, 3000
        got = [
            (r["event_id"], r["direction"])
            for r in cusum_alarms(_events(spark, values), kappa, h).collect()
        ]
        assert sorted(got) == sorted(_fold_alarms(values, kappa, h))
        assert len(got) > 0

    def test_planted_upward_shift_alarms_after_shift_only(self, spark):
        values = [10.0] * 50 + [30.0] * 50
        # mu = 20; kappa 5 units; up-side gains 5/step after the shift
        got = cusum_alarms(_events(spark, values), 500, 2000).collect()
        ups = [r["event_id"] for r in got if r["direction"] == "up"]
        assert ups and min(ups) >= 50  # no alarm before the shift
        # the flat-at-10 prefix also trips the DOWN side (it sits 10
        # below mu) — its alarms ORIGINATE in the prefix and may
        # linger a few steps past the shift while S⁻ decays by
        # 15-units/step from its 2500-unit peak
        downs = [r["event_id"] for r in got if r["direction"] == "down"]
        assert downs and min(downs) < 50
        assert max(downs) < 50 + 2500 // 15 + 1

    def test_downward_shift_detected(self, spark):
        values = [30.0] * 50 + [10.0] * 50
        got = cusum_alarms(_events(spark, values), 500, 2000).collect()
        downs = [r["event_id"] for r in got if r["direction"] == "down"]
        assert downs and min(downs) >= 50

    def test_no_alarms_on_flat_series(self, spark):
        got = cusum_alarms(_events(spark, [10.0] * 100), 0, 1).collect()
        assert got == []

    def test_bad_params_raise(self, spark):
        with pytest.raises(ValueError):
            cusum_alarms(_events(spark, [1.0]), -1, 10)
        with pytest.raises(ValueError):
            cusum_alarms(_events(spark, [1.0]), 5, 0)

    def test_matches_duckdb_oracle_on_testdata(self, spark):
        import os

        sf = os.environ.get(
            "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
        )
        path = f"{sf}/events.parquet"
        if not os.path.exists(path):
            pytest.skip(f"{path} not present")
        from eventhub_to_timescale_spark.sources.testdata import load_table

        ev = load_table(spark, sf, "events")
        got = sorted(
            (r["event_type"], r["event_id"], r["direction"])
            for r in cusum_alarms(ev).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')"
        )
        want = sorted(
            (t, i, d)
            for (t, i, _ts, d) in con.execute(
                cusum_alarms_oracle_sql()
            ).fetchall()
        )
        assert got == want and len(got) > 0

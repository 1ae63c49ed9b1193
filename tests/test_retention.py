"""Semantic tests for cohort retention (operators/retention.py).
Cross-engine parity runs in check_parity / test_gate_tail_parity.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from eventhub_to_timescale_spark.operators.retention import cohort_retention

DAY = 86400


def _ev(spark, rows):
    """rows: (user_id, iso_ts)"""
    return spark.createDataFrame(
        [(u, datetime.fromisoformat(t)) for u, t in rows],
        "user_id long, ts timestamp",
    )


def _matrix(out):
    return {
        (r["cohort"].strftime("%Y-%m-%d"), r["k"]): r["n_users"]
        for r in out
    }


class TestCohortRetention:
    def test_basic_matrix(self, spark):
        ev = _ev(
            spark,
            [
                (1, "2024-01-01T08:00:00"),   # cohort d0
                (1, "2024-01-02T09:00:00"),   # k=1
                (1, "2024-01-04T23:59:59"),   # k=3
                (2, "2024-01-01T10:00:00"),   # cohort d0
                (3, "2024-01-02T00:00:00"),   # cohort d1
                (3, "2024-01-02T23:00:00"),   # same bucket, no dup
            ],
        )
        m = _matrix(cohort_retention(ev).collect())
        assert m == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 1): 1,
            ("2024-01-01", 3): 1,
            ("2024-01-02", 0): 1,
        }

    def test_k0_is_cohort_size(self, spark):
        ev = _ev(
            spark,
            [(u, "2024-03-05T12:00:00") for u in range(10)]
            + [(u, "2024-03-06T12:00:00") for u in range(4)],
        )
        m = _matrix(cohort_retention(ev).collect())
        assert m[("2024-03-05", 0)] == 10
        assert m[("2024-03-05", 1)] == 4
        assert ("2024-03-06", 0) not in m  # nobody NEW on day 2

    def test_bucket_seconds_param(self, spark):
        ev = _ev(
            spark,
            [
                (1, "2024-01-01T00:10:00"),
                (1, "2024-01-01T07:10:00"),  # next 6-h bucket
            ],
        )
        m = _matrix(cohort_retention(ev, bucket_seconds=6 * 3600).collect())
        assert sorted(k for (_, k) in m) == [0, 1]

    def test_rejects_nonpositive_bucket(self, spark):
        with pytest.raises(ValueError):
            cohort_retention(_ev(spark, []), bucket_seconds=0)

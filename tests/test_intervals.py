"""Semantic tests for interval coalescing (operators/intervals.py):
island mechanics on hand-built frames plus a brute-force equivalence
sweep on seeded pseudo-random interval sets. Cross-engine parity runs
in check_parity / test_gate_tail_parity.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.intervals import (
    coalesce_intervals,
    live_intervals,
)

T0 = datetime(2024, 1, 1)


def _iv(spark, rows):
    """rows: (subject, start_s, end_s) as second offsets from T0."""
    return spark.createDataFrame(
        [
            (s, T0 + timedelta(seconds=a), T0 + timedelta(seconds=b))
            for s, a, b in rows
        ],
        "measurement_subject string, start timestamp, end timestamp",
    )


def _sec(ts):
    return (ts - T0).total_seconds()


class TestCoalesceIntervals:
    def test_overlap_touch_and_gap(self, spark):
        out = coalesce_intervals(
            _iv(
                spark,
                [
                    ("a", 0, 10),
                    ("a", 5, 15),    # overlaps -> merges
                    ("a", 15, 20),   # touches -> merges (half-open union)
                    ("a", 25, 30),   # gap -> new island
                ],
            )
        ).collect()
        got = sorted(
            (_sec(r["start"]), _sec(r["end"]), r["n_intervals"])
            for r in out
        )
        assert got == [(0.0, 20.0, 3), (25.0, 30.0, 1)]

    def test_long_interval_swallows_later_short_ones(self, spark):
        # the running-max (not lag) case: [0,100) must absorb [10,20)
        # AND keep [30,40) in the same island even though lag(end)=20
        out = coalesce_intervals(
            _iv(spark, [("a", 0, 100), ("a", 10, 20), ("a", 30, 40)])
        ).collect()
        assert len(out) == 1
        assert _sec(out[0]["end"]) == 100.0
        assert out[0]["n_intervals"] == 3

    def test_subjects_independent(self, spark):
        out = coalesce_intervals(
            _iv(spark, [("a", 0, 10), ("b", 5, 15)])
        ).collect()
        assert len(out) == 2

    def test_degenerate_dropped(self, spark):
        out = coalesce_intervals(
            _iv(spark, [("a", 10, 10), ("a", 20, 5), ("a", 0, 1)])
        ).collect()
        assert len(out) == 1 and out[0]["n_intervals"] == 1

    def test_brute_force_equivalence(self, spark):
        # seeded pseudo-random interval sets vs a python sweep-line
        rows = []
        state = 12345
        for i in range(300):
            state = (state * 1103515245 + 12345) % (2**31)
            a = state % 5000
            state = (state * 1103515245 + 12345) % (2**31)
            ln = 1 + state % 400
            rows.append((f"s{i % 7}", a, a + ln))
        out = coalesce_intervals(_iv(spark, rows)).collect()
        got = {}
        for r in out:
            got.setdefault(r["measurement_subject"], []).append(
                (_sec(r["start"]), _sec(r["end"]), r["n_intervals"])
            )
        for v in got.values():
            v.sort()

        want = {}
        by_subj = {}
        for s, a, b in rows:
            by_subj.setdefault(s, []).append((a, b))
        for s, ivs in by_subj.items():
            ivs.sort()
            islands = []
            for a, b in ivs:
                if islands and a <= islands[-1][1]:
                    islands[-1][1] = max(islands[-1][1], b)
                    islands[-1][2] += 1
                else:
                    islands.append([a, b, 1])
            want[s] = [(float(a), float(b), n) for a, b, n in islands]
        assert got == want


class TestLiveIntervals:
    def test_beats_to_islands(self, spark):
        cond = spark.createDataFrame(
            [
                ("u1", T0, "value", 1.0),
                ("u1", T0 + timedelta(seconds=1800), "value", 1.0),
                ("u1", T0 + timedelta(seconds=9000), "value", 1.0),
                ("u1", T0 + timedelta(seconds=100), "other", 1.0),
                ("u1", T0 + timedelta(seconds=50), "value", None),
            ],
            "measurement_subject string, timestamp timestamp, "
            "measurement_of string, measurement_number double",
        )
        out = live_intervals(cond, tolerance_seconds=3600).collect()
        got = sorted(
            (_sec(r["start"]), _sec(r["end"]), r["n_intervals"])
            for r in out
        )
        # beats at 0 and 1800 chain (gap < tol); beat at 9000 is alone
        assert got == [(0.0, 5400.0, 2), (9000.0, 12600.0, 1)]

    def test_microsecond_precision_preserved(self, spark):
        t = T0 + timedelta(microseconds=778549)
        cond = spark.createDataFrame(
            [("u1", t, "value", 1.0)],
            "measurement_subject string, timestamp timestamp, "
            "measurement_of string, measurement_number double",
        )
        (r,) = live_intervals(cond, tolerance_seconds=10).collect()
        assert r["start"] == t
        assert r["end"] == t + timedelta(seconds=10)

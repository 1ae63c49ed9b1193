"""Markov transition matrix + inter-arrival burstiness
(operators/markov.py): literal hand-computed frames, invariants, and
cross-engine oracle parity at sf0.001."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.markov import (
    interarrival_oracle_sql,
    interarrival_stats,
    markov_oracle_sql,
    markov_transitions,
)

T0 = datetime(2024, 1, 1)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    """rows: (event_id, minutes_offset, user_id, event_type)."""
    return spark.createDataFrame(
        [
            (i, T0 + timedelta(minutes=m), u, t, 0.0, None)
            for (i, m, u, t) in rows
        ],
        SCHEMA,
    )


class TestMarkovTransitions:
    def test_literal_two_users(self, spark):
        # user 0: a -> b -> a   user 1: b -> b
        df = _events(
            spark,
            [
                (1, 0, 0, "a"),
                (2, 1, 0, "b"),
                (3, 2, 0, "a"),
                (4, 0, 1, "b"),
                (5, 5, 1, "b"),
            ],
        )
        got = {
            (r.from_state, r.to_state): r
            for r in markov_transitions(df).collect()
        }
        # pairs: (a,b) 1, (b,a) 1, (b,b) 1; n_states = 2 (a, b both
        # appear as destinations); totals: a->1, b->2
        assert set(got) == {("a", "b"), ("b", "a"), ("b", "b")}
        assert got[("a", "b")].pair_n == 1
        assert got[("a", "b")].from_total == 1
        assert got[("a", "b")].prob == pytest.approx((1 + 1) / (1 + 2))
        assert got[("b", "a")].prob == pytest.approx((1 + 1) / (2 + 2))
        assert got[("b", "b")].prob == pytest.approx((1 + 1) / (2 + 2))

    def test_no_cross_user_pairs(self, spark):
        # Consecutive in global time but different users -> no pair.
        df = _events(spark, [(1, 0, 0, "a"), (2, 1, 1, "b")])
        assert markov_transitions(df).count() == 0

    def test_ties_broken_by_event_id(self, spark):
        # Same timestamp: event_id order decides the sequence.
        df = _events(spark, [(2, 0, 0, "b"), (1, 0, 0, "a")])
        rows = markov_transitions(df).collect()
        assert len(rows) == 1
        assert (rows[0].from_state, rows[0].to_state) == ("a", "b")

    def test_smoothed_rows_below_one(self, spark):
        # Laplace smoothing keeps every prob strictly in (0, 1).
        df = _events(
            spark,
            [(i, i, 0, "ab"[i % 2]) for i in range(20)],
        )
        for r in markov_transitions(df).collect():
            assert 0.0 < r.prob < 1.0


class TestInterarrival:
    def test_literal_gaps(self, spark):
        # type a at minutes 0, 1, 3 -> gaps 60s, 120s
        df = _events(
            spark,
            [(1, 0, 0, "a"), (2, 1, 0, "a"), (3, 3, 0, "a")],
        )
        row = interarrival_stats(df).collect()[0]
        assert row.n_gaps == 2
        assert row.mean_gap_s == pytest.approx(90.0)
        # population stddev of [60, 120] = 30
        assert row.std_gap_s == pytest.approx(30.0)
        assert row.min_gap_ms == 60_000
        assert row.max_gap_ms == 120_000
        assert row.burstiness == pytest.approx((30 - 90) / (30 + 90))

    def test_single_event_type_dropped(self, spark):
        df = _events(spark, [(1, 0, 0, "solo"), (2, 1, 0, "a"), (3, 2, 0, "a")])
        types = {r.event_type for r in interarrival_stats(df).collect()}
        assert types == {"a"}

    def test_constant_cadence_burstiness_negative_one_limit(self, spark):
        # Perfectly periodic arrivals: sigma = 0 -> B = -1.
        df = _events(spark, [(i, 5 * i, 0, "tick") for i in range(10)])
        row = interarrival_stats(df).collect()[0]
        assert row.std_gap_s == 0.0
        assert row.burstiness == -1.0


@pytest.mark.parametrize(
    "op,sql",
    [
        (markov_transitions, markov_oracle_sql()),
        (interarrival_stats, interarrival_oracle_sql()),
    ],
    ids=["markov", "interarrival"],
)
def test_oracle_parity_sf0001(spark, op, sql):
    path = "/root/testdata/sf0.001/events.parquet"
    got = op(spark.read.parquet(path)).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')"
    )
    want = con.execute(sql).fetchall()
    assert len(got) == len(want)
    for g, w in zip([tuple(r) for r in got], want):
        for a, b in zip(g, w):
            if isinstance(a, float):
                assert a == pytest.approx(b, abs=1e-12), (g, w)
            else:
                assert a == b, (g, w)

"""Semantic tests for the ordered-step funnel (operators/funnel.py):
greedy earliest-progression mechanics on hand-built frames.
Cross-engine parity runs in check_parity / test_gate_tail_parity.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from eventhub_to_timescale_spark.operators.funnel import funnel_reached

T0 = datetime(2024, 1, 1)


def _ev(spark, rows):
    """rows: (user_id, seconds_offset, event_type)"""
    return spark.createDataFrame(
        [
            (u, i, T0 + timedelta(seconds=s), t)
            for i, (u, s, t) in enumerate(rows)
        ],
        "user_id long, event_id long, ts timestamp, event_type string",
    )


def _m(out):
    return {r["stage"]: (r["step_name"], r["n_users"]) for r in out}


STEPS = ["view", "click", "purchase"]


class TestFunnelReached:
    def test_order_matters(self, spark):
        ev = _ev(
            spark,
            [
                (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
                (2, 0, "click"), (2, 10, "view"),      # click BEFORE view
                (3, 0, "view"), (3, 5, "purchase"),    # skipped click
            ],
        )
        m = _m(funnel_reached(ev, STEPS).collect())
        # user1 reaches 3; user2 reaches 1 (view at t=10; its earlier
        # click cannot count); user3 reaches 1
        assert m == {
            1: ("view", 3),
            2: ("click", 1),
            3: ("purchase", 1),
        }

    def test_strictly_later_requirement(self, spark):
        ev = _ev(
            spark,
            [
                (1, 0, "view"), (1, 0, "click"),  # same instant: no
                (2, 0, "view"), (2, 1, "click"),
            ],
        )
        m = _m(funnel_reached(ev, STEPS).collect())
        assert m[1] == ("view", 2)
        assert m[2] == ("click", 1)

    def test_greedy_earliest_progression(self, spark):
        # the greedy match binds step1 to the FIRST view; a purchase
        # between the first view and the first later click is lost
        ev = _ev(
            spark,
            [
                (1, 0, "view"), (1, 5, "purchase"), (1, 10, "click"),
                (1, 20, "purchase"),
            ],
        )
        m = _m(funnel_reached(ev, STEPS).collect())
        assert m[3] == ("purchase", 1)  # 0 -> 10 -> 20 completes

    def test_users_with_no_step_one_absent(self, spark):
        ev = _ev(spark, [(1, 0, "error"), (2, 0, "signup")])
        assert funnel_reached(ev, STEPS).collect() == []

    def test_rejects_empty_steps(self, spark):
        with pytest.raises(ValueError):
            funnel_reached(_ev(spark, [(1, 0, "view")]), [])

    def test_brute_force_equivalence(self, spark):
        # seeded pseudo-random event streams vs a python fold
        types = ["view", "click", "purchase", "error", "signup"]
        rows = []
        state = 987654321
        for _ in range(600):
            state = (state * 1103515245 + 12345) % (2**31)
            u = state % 25
            state = (state * 1103515245 + 12345) % (2**31)
            s = state % 10000
            state = (state * 1103515245 + 12345) % (2**31)
            rows.append((u, s, types[state % len(types)]))
        out = funnel_reached(_ev(spark, rows), STEPS).collect()
        got = {r["stage"]: r["n_users"] for r in out}

        by_user: dict[int, list] = {}
        for i, (u, s, t) in enumerate(rows):
            by_user.setdefault(u, []).append((s, i, t))
        reached = {1: 0, 2: 0, 3: 0}
        for evs in by_user.values():
            evs.sort()
            stage, t_stage = 0, None
            for s, _i, t in evs:
                if (
                    stage < len(STEPS)
                    and t == STEPS[stage]
                    and (t_stage is None or s > t_stage)
                ):
                    stage, t_stage = stage + 1, s
            for k in range(1, stage + 1):
                reached[k] += 1
        want = {k: v for k, v in reached.items() if v > 0}
        assert got == want

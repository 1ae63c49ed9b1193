"""Market-basket PMI (operators/basket.py): literal basket counts,
PMI sign semantics, session-boundary respect, support pruning, and
oracle parity."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.basket import (
    basket_pmi,
    basket_pmi_oracle_sql,
)

T0 = datetime(2024, 1, 1)
GAP = 1800


def _events(spark, spec):
    """spec: (user, session_slot, [types]) — sessions separated by
    well over the gap; events inside a session are seconds apart."""
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


class TestBasketPmi:
    def test_literal_counts_and_pmi(self, spark):
        # 4 sessions: {a,b} x3, {a} x1 -> n_a=4, n_b=3, n_ab=3, N=4
        df = _events(
            spark,
            [
                (1, 0, ["a", "b"]),
                (1, 1, ["a", "b"]),
                (2, 0, ["a", "b"]),
                (2, 1, ["a"]),
            ],
        )
        rows = basket_pmi(df).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.type_a, r.type_b) == ("a", "b")
        assert (r.n_ab, r.n_a, r.n_b, r.n_sessions) == (3, 4, 3, 4)
        assert r.pmi == pytest.approx(math.log(3 * 4 / (4 * 3)), abs=1e-6)

    def test_duplicate_events_count_once_per_basket(self, spark):
        df = _events(
            spark,
            [(1, 0, ["a", "a", "b", "b", "b"]), (1, 1, ["a", "b"])],
        )
        r = basket_pmi(df).collect()[0]
        assert (r.n_ab, r.n_sessions) == (2, 2)

    def test_session_boundary_splits_baskets(self, spark):
        # a and b in DIFFERENT sessions of the same user never pair.
        df = _events(
            spark,
            [(1, 0, ["a"]), (1, 1, ["b"]), (1, 2, ["a", "b"]),
             (1, 3, ["a", "b"])],
        )
        r = basket_pmi(df).collect()[0]
        assert r.n_ab == 2  # only the two co-occurrence sessions

    def test_min_support_prunes(self, spark):
        df = _events(
            spark,
            [(1, 0, ["a", "b"]), (1, 1, ["a", "c"]), (1, 2, ["a", "c"])],
        )
        got = {
            (r.type_a, r.type_b) for r in basket_pmi(df, min_support=2).collect()
        }
        assert got == {("a", "c")}

    def test_negative_pmi_for_avoidance(self, spark):
        # a and b each common, together only once out of many.
        spec = [(u, 0, ["a"]) for u in range(5)]
        spec += [(u, 0, ["b"]) for u in range(5, 10)]
        spec += [(99, 0, ["a", "b"]), (98, 0, ["a", "b"])]
        r = basket_pmi(_events(spark, spec)).collect()[0]
        assert r.pmi < 0

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            basket_pmi(_events(spark, [(1, 0, ["a"])]), min_support=0)


def test_oracle_parity_sf0001(spark):
    path = "/root/testdata/sf0.001/events.parquet"
    got = [
        tuple(r) for r in basket_pmi(spark.read.parquet(path)).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')"
    )
    want = con.execute(basket_pmi_oracle_sql()).fetchall()
    assert got == want and len(got) > 0


def test_unpersisted_form_matches(spark):
    df = _events(
        spark,
        [
            (1, 0, ["a", "b", "c"]),
            (1, 1, ["a", "b"]),
            (2, 0, ["b", "c"]),
            (2, 1, ["a", "b", "c"]),
        ],
    )
    cached = basket_pmi(df).collect()
    lazy = basket_pmi(df, persist_baskets=False).collect()
    assert cached == lazy and len(cached) > 0

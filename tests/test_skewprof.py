"""Join-key skew profiler (operators/skewprof.py): literal skew pins,
uniform-vs-skewed contrast, determinism under ties, and oracle
parity."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.skewprof import (
    skew_profile,
    skew_profile_oracle_sql,
)

T0 = datetime(2024, 1, 1)


def _events(spark, user_counts):
    """user_counts: {user_id: n_rows}."""
    rows = []
    eid = 0
    for u, n in user_counts.items():
        for _ in range(n):
            rows.append(
                (eid, T0 + timedelta(seconds=eid), u, "a", 1.0, None)
            )
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


class TestSkewProfile:
    def test_literal_hot_key(self, spark):
        # one key holds 90 of 100 rows among 11 keys
        df = _events(spark, {0: 90, **{u: 1 for u in range(1, 11)}})
        rows = skew_profile(df, top_k=3).collect()
        assert len(rows) == 3
        top = rows[0]
        assert (top.key, top.cnt, top.rank) == ("0", 90, 1)
        assert top.share_ppm == 900_000
        assert top.n_keys == 11 and top.total_rows == 100
        # max/avg = 90 / (100/11) = 9.9 -> x100 = 990
        assert top.max_avg_x100 == 990
        # p99 order statistic: ceil(0.99*11) = 11th smallest = 90
        assert top.p99_cnt == 90

    def test_uniform_keys_ratio_100(self, spark):
        df = _events(spark, {u: 10 for u in range(8)})
        top = skew_profile(df, top_k=1).collect()[0]
        assert top.max_avg_x100 == 100
        assert top.p99_cnt == 10

    def test_deterministic_tiebreak(self, spark):
        df = _events(spark, {5: 3, 2: 3, 9: 3})
        keys = [r.key for r in skew_profile(df, top_k=3).collect()]
        assert keys == ["2", "5", "9"]  # count ties -> key asc

    def test_topk_truncates(self, spark):
        df = _events(spark, {u: u + 1 for u in range(20)})
        rows = skew_profile(df, top_k=5).collect()
        assert len(rows) == 5
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        assert rows[0].cnt == 20

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            skew_profile(_events(spark, {1: 1}), top_k=0)


def test_oracle_parity_sf0001(spark):
    path = "/root/testdata/sf0.001/events.parquet"
    got = [
        tuple(r) for r in skew_profile(spark.read.parquet(path)).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')"
    )
    want = con.execute(skew_profile_oracle_sql()).fetchall()
    assert got == want and len(got) == 10

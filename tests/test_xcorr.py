"""Activity cross-correlation (operators/xcorr.py): literal perfect
correlation/anticorrelation, lead-lag detection, degenerate variance,
and oracle parity."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.xcorr import (
    activity_xcorr,
    xcorr_oracle_sql,
)

T0 = datetime(2024, 1, 1)
BUCKET = 3600


def _events(spark, spec):
    """spec: list of (event_type, bucket_idx, n_events) — expands to n
    events inside that hour bucket."""
    rows = []
    eid = 0
    for etype, b, n in spec:
        for j in range(n):
            rows.append(
                (eid, T0 + timedelta(hours=b, minutes=j % 50), 0, etype,
                 1.0, None)
            )
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _get(spark, spec, max_lag=1):
    df = activity_xcorr(_events(spark, spec), BUCKET, max_lag)
    return {(r.type_a, r.type_b, r.lag): r for r in df.collect()}


class TestActivityXcorr:
    def test_identical_series_r_one_at_lag0(self, spark):
        spec = [("a", b, c) for b, c in enumerate([3, 1, 4, 1, 5])]
        spec += [("b", b, c) for b, c in enumerate([3, 1, 4, 1, 5])]
        got = _get(spark, spec)
        assert got[("a", "b", 0)].r == pytest.approx(1.0)

    def test_shifted_series_peak_at_lag(self, spark):
        # b's counts are a's shifted one bucket later: y(t) = x(t-1),
        # so x(t) matches y(t+1) -> peak at lag +1.
        xs = [3, 1, 4, 1, 5, 9]
        spec = [("a", b, c) for b, c in enumerate(xs)]
        spec += [("b", b + 1, c) for b, c in enumerate(xs)]
        got = _get(spark, spec)
        assert got[("a", "b", 1)].r == pytest.approx(1.0)
        assert got[("a", "b", 0)].r < 0.9

    def test_anticorrelated(self, spark):
        spec = [("a", b, c) for b, c in enumerate([5, 1, 5, 1])]
        spec += [("b", b, c) for b, c in enumerate([1, 5, 1, 5])]
        got = _get(spark, spec)
        assert got[("a", "b", 0)].r == pytest.approx(-1.0)

    def test_constant_series_null_r(self, spark):
        spec = [("a", b, 2) for b in range(4)]  # zero variance
        spec += [("b", b, c) for b, c in enumerate([1, 2, 3, 4])]
        got = _get(spark, spec)
        assert got[("a", "b", 0)].r is None

    def test_overlap_count_shrinks_with_lag(self, spark):
        spec = [("a", b, b + 1) for b in range(6)]
        spec += [("b", b, 2 * b + 1) for b in range(6)]
        got = _get(spark, spec, max_lag=2)
        assert got[("a", "b", 0)].n == 6
        assert got[("a", "b", 2)].n == 4
        assert got[("a", "b", -2)].n == 4

    def test_validation(self, spark):
        df = _events(spark, [("a", 0, 1)])
        with pytest.raises(ValueError):
            activity_xcorr(df, 0)
        with pytest.raises(ValueError):
            activity_xcorr(df, 3600, -1)


def test_oracle_parity_sf0001(spark):
    path = "/root/testdata/sf0.001/events.parquet"
    got = [
        tuple(r)
        for r in activity_xcorr(spark.read.parquet(path)).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')"
    )
    want = con.execute(xcorr_oracle_sql()).fetchall()
    assert len(got) == len(want) > 0
    assert got == want


def test_negative_epoch_buckets_floor_and_match_oracle(spark):
    """Pre-1970 timestamps (negative epoch seconds) must FLOOR into
    the previous bucket on both engines (r11 advice: cast-after-divide
    truncated toward zero on the Spark side).  Parity is pinned on a
    corpus straddling the epoch."""
    import pandas as pd

    rows = []
    eid = 0
    # buckets around the epoch: -2, -1, 0, 1 (3600 s buckets)
    for etype, b, n in [
        ("a", -2, 3), ("a", -1, 1), ("a", 0, 4), ("a", 1, 2),
        ("b", -2, 1), ("b", -1, 3), ("b", 0, 2), ("b", 1, 5),
    ]:
        for j in range(n):
            rows.append((eid, datetime(1970, 1, 1)
                         + timedelta(seconds=b * BUCKET + j * 60),
                         0, etype, 1.0, None))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = [tuple(r) for r in activity_xcorr(df, BUCKET, 1).collect()]
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type",
                     "value", "props"],
        ),
    )
    want = con.execute(xcorr_oracle_sql(BUCKET, 1)).fetchall()
    assert len(got) == len(want) > 0
    assert got == want
    # and the floor semantics specifically: -1 s lands in bucket -1
    from pyspark.sql import functions as F
    b = (
        spark.createDataFrame(
            [(0, datetime(1969, 12, 31, 23, 59, 59), 0, "a", 1.0, None)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        .select(F.floor(F.unix_timestamp("ts") / F.lit(BUCKET))
                .cast("long").alias("b"))
        .collect()[0][0]
    )
    assert b == -1


def test_unpersisted_form_matches(spark):
    spec = [("a", b, c) for b, c in enumerate([3, 1, 4, 1, 5])]
    spec += [("b", b, c) for b, c in enumerate([2, 7, 1, 8, 2])]
    ev = _events(spark, spec)
    cached = activity_xcorr(ev, BUCKET, 1).collect()
    lazy = activity_xcorr(ev, BUCKET, 1, persist_counts=False).collect()
    assert cached == lazy and len(cached) > 0

"""Streaming sessionization (streaming/stateful.py
streaming_sessionize): exact batch-convergence — replay the events
table in ts-ordered micro-batches with a per-user flush event; the
emitted sessions must be row-identical to the batch operator on the
pre-flush input — plus a boundary-spanning split only carried state
can stitch."""

from __future__ import annotations

import os
import time as _time
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.001")
GAP = 1800


def _run_stream(spark, tmp_path, parts):
    """Write the given DataFrames oldest-first and stream them one
    file per trigger through streaming_sessionize."""
    from conftest import drain_stateful_stream
    from eventhub_to_timescale_spark.streaming.stateful import (
        streaming_sessionize,
    )

    raw_path = str(tmp_path / "raw")
    for part in parts:
        part.coalesce(1).write.mode("append").parquet(raw_path)
        _time.sleep(0.05)
    stream = (
        spark.readStream.schema(spark.read.parquet(raw_path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
    )
    q = (
        streaming_sessionize(stream, GAP)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful_stream(q)
    return spark.read.parquet(str(tmp_path / "out"))


def _rows(df):
    return sorted(
        (
            r["user_id"],
            r["session_idx"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["duration_s"],
        )
        for r in df.collect()
    )


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_sessionize_converges_to_batch(spark, tmp_path):
    from eventhub_to_timescale_spark.operators.sessions import sessionize
    from eventhub_to_timescale_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id"
    )
    # flush: one far-future event per user closes every open session;
    # the flush opens session idx+1, which is never emitted.
    hi = ev.agg(F.max("ts")).collect()[0][0]
    flush = ev.groupBy("user_id").agg(
        (F.lit(10**9) + F.col("user_id")).alias("event_id"),
        F.lit(hi + timedelta(seconds=10 * GAP)).alias("ts"),
    ).select("event_id", "ts", "user_id")

    lo = ev.agg(F.min("ts")).collect()[0][0]
    span = (hi - lo) / 3
    parts = [
        ev.filter(
            (F.col("ts") >= lo + i * span)
            & ((F.col("ts") < lo + (i + 1) * span) if i < 2 else F.lit(True))
        )
        for i in range(3)
    ] + [flush]
    got = _rows(_run_stream(spark, tmp_path, parts))
    want = _rows(sessionize(ev, gap_seconds=GAP))
    assert len(got) > 0
    assert got == want


def test_session_spanning_batch_boundary(spark, tmp_path):
    """A session whose events straddle two micro-batches must come out
    as ONE session — only carried state can stitch it."""
    T0 = datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, user_id long"
    batch1 = spark.createDataFrame(
        [(1, T0, 7), (2, T0 + timedelta(seconds=60), 7)], schema
    )
    batch2 = spark.createDataFrame(
        [(3, T0 + timedelta(seconds=120), 7)], schema
    )
    flush = spark.createDataFrame(
        [(9, T0 + timedelta(seconds=120 + 10 * GAP), 7)], schema
    )
    out = _rows(_run_stream(spark, tmp_path, [batch1, batch2, flush]))
    assert len(out) == 1
    user, idx, start, end, n, dur = out[0]
    assert (user, idx, n, dur) == (7, 1, 3, 120)
    assert start == T0 and end == T0 + timedelta(seconds=120)


def test_exact_gap_continues_boundary(spark, tmp_path):
    """Gap == gap_seconds continues; gap_seconds + 1 splits — the same
    knife-edge the batch operator pins."""
    T0 = datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, user_id long"
    data = spark.createDataFrame(
        [
            (1, T0, 1),
            (2, T0 + timedelta(seconds=GAP), 1),  # continues
            (3, T0 + timedelta(seconds=2 * GAP + 1), 1),  # splits
        ],
        schema,
    )
    flush = spark.createDataFrame(
        [(9, T0 + timedelta(seconds=20 * GAP), 1)], schema
    )
    out = _rows(_run_stream(spark, tmp_path, [data, flush]))
    assert [(r[1], r[4]) for r in out] == [(1, 2), (2, 1)]


class _FakeState:
    """Minimal GroupState stand-in for fn-level tests."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    # applyInPandasWithState exposes .get as a property-like tuple
    get = property(get)

    def update(self, v):
        self._v = tuple(v)

    def setTimeoutDuration(self, ms):
        pass

    def remove(self):
        self._v = None


def _reference_fold(ts_list, state, gap):
    """Literal per-row Python fold of the session recursion."""
    start, last, n, idx = state if state else (-1, -1, 0, 0)
    closed = []
    for t in ts_list:
        if start < 0:
            start, last, n, idx = t, t, 1, idx + 1
        elif t // 1_000_000 - last // 1_000_000 > gap:
            closed.append((idx, start, last, n))
            start, last, n, idx = t, t, 1, idx + 1
        else:
            last, n = t, n + 1
    return closed, (start, last, n, idx)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_vectorized_fold_equals_reference(seed):
    """The cumsum-segmented batch fn emits exactly what the literal
    per-row recursion emits, for random gap patterns split across
    random micro-batch boundaries."""
    import random

    import numpy as np
    import pandas as pd

    from eventhub_to_timescale_spark.streaming.stateful import (
        _make_session_fn,
    )

    rng = random.Random(seed)
    gap = 100  # seconds
    # random inter-arrival times straddling the threshold
    ts, t = [], 1_700_000_000_000_000
    for _ in range(200):
        t += rng.choice([1, 50, 99, 100, 101, 1000]) * 1_000_000
        ts.append(t)

    # run the vectorized fn over random micro-batch splits
    fn = _make_session_fn(gap)
    st = _FakeState()
    got = []
    i = 0
    while i < len(ts):
        j = min(len(ts), i + rng.randint(1, 40))
        pdf = pd.DataFrame(
            {
                "user_id": 7,
                "event_id": range(i, j),
                "ts": pd.to_datetime(np.array(ts[i:j], dtype="int64"), unit="us"),
            }
        )
        for out in fn((7,), iter([pdf]), st):
            for r in out.itertuples(index=False):
                got.append(
                    (
                        r.session_idx,
                        int(pd.Timestamp(r.session_start).value // 1000),
                        int(pd.Timestamp(r.session_end).value // 1000),
                        r.n_events,
                    )
                )
        i = j

    want, final = _reference_fold(ts, None, gap)
    assert got == want
    assert tuple(map(int, st.get)) == final


def test_timeout_emits_open_session():
    """The idle timeout CLOSES the carried session (emits it) rather
    than discarding it — r11 advice: a user idle past the 24 h window
    must not lose their last session."""
    import numpy as np
    import pandas as pd

    from eventhub_to_timescale_spark.streaming.stateful import (
        _make_session_fn,
    )

    fn = _make_session_fn(100)
    st = _FakeState()
    t0 = 1_700_000_000_000_000
    pdf = pd.DataFrame(
        {
            "user_id": 7,
            "event_id": [0, 1],
            "ts": pd.to_datetime(
                np.array([t0, t0 + 30_000_000], dtype="int64"), unit="us"
            ),
        }
    )
    assert list(fn((7,), iter([pdf]), st)) == []  # session stays open
    assert st.exists
    st.hasTimedOut = True
    out = list(fn((7,), iter([]), st))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (
        int(row["session_idx"]),
        int(pd.Timestamp(row["session_start"]).value // 1000),
        int(pd.Timestamp(row["session_end"]).value // 1000),
        int(row["n_events"]),
        int(row["duration_s"]),
    ) == (1, t0, t0 + 30_000_000, 2, 30)
    assert not st.exists  # state released after the close


def test_timeout_with_no_state_emits_nothing():
    from eventhub_to_timescale_spark.streaming.stateful import (
        _make_session_fn,
    )

    st = _FakeState()
    st.hasTimedOut = True
    assert list(_make_session_fn(100)((7,), iter([]), st)) == []

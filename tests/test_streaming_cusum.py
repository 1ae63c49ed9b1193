"""Streaming CUSUM (streaming/stateful.py streaming_cusum_alarms):
exact batch-convergence — replay the events table in ts-ordered
micro-batches against a fixed target mean; the alarm set must be
row-identical to the batch operator with the same mu_cents."""

from __future__ import annotations

import os
import time as _time

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.001")
MU = 10_000  # 100.00 units — near the synthetic series' mean


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_cusum_converges_to_batch(spark, tmp_path):
    from conftest import drain_stateful_stream
    from eventhub_to_timescale_spark.operators.changepoint import (
        cusum_alarms,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.stateful import (
        streaming_cusum_alarms,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    raw_path = str(tmp_path / "raw")
    # 3 ts-ordered splits written oldest-first: arrival order == ts
    # order, the regime where the incremental chart must equal the
    # batch window plan exactly
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    for i in range(3):
        part = ev.filter(
            (F.col("ts") >= lo + i * span)
            & (F.col("ts") < lo + (i + 1) * span)
            if i < 2
            else (F.col("ts") >= lo + 2 * span)
        )
        part.coalesce(1).write.mode("append").parquet(raw_path)
        _time.sleep(0.05)

    stream = (
        spark.readStream.schema(
            spark.read.parquet(raw_path).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
    )
    q = (
        streaming_cusum_alarms(stream, mu_cents=MU)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful_stream(q)

    got = sorted(
        (r["event_type"], r["event_id"], r["direction"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    want = sorted(
        (r["event_type"], r["event_id"], r["direction"])
        for r in cusum_alarms(ev, mu_cents=MU).collect()
    )
    assert got == want
    assert len(got) > 0, "pick MU so the replay actually alarms"


def test_stream_state_carries_across_batches(spark, tmp_path):
    """A shift split across micro-batches still alarms: batch 1 ends
    mid-ramp (statistic below h), batch 2 pushes it over — only the
    carried (cumsum, min) state can produce the alarm."""
    from datetime import datetime, timedelta

    from conftest import drain_stateful_stream
    from eventhub_to_timescale_spark.streaming.stateful import (
        streaming_cusum_alarms,
    )

    T0 = datetime(2024, 1, 1)
    mk = lambda i, v: (i, T0 + timedelta(minutes=i), "a", float(v))  # noqa: E731
    schema = "event_id long, ts timestamp, event_type string, value double"
    # mu=10.00, kappa=1.00: each 15.00 sample adds 4.00 units = 400
    # cents; h=2000 needs 6 samples — split 3 + 3
    batch1 = spark.createDataFrame([mk(i, 15.0) for i in range(3)], schema)
    batch2 = spark.createDataFrame([mk(i + 3, 15.0) for i in range(3)], schema)
    raw_path = str(tmp_path / "raw")
    for b in (batch1, batch2):
        b.coalesce(1).write.mode("append").parquet(raw_path)
        _time.sleep(0.05)
    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
    )
    q = (
        streaming_cusum_alarms(
            stream, mu_cents=1000, kappa_cents=100, h_cents=2000
        )
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful_stream(q)
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    ids = sorted(r["event_id"] for r in rows)
    # S after sample i (0-based) = 400·(i+1); > 2000 from i=5 on
    assert ids == [5]
    assert all(r["direction"] == "up" for r in rows)

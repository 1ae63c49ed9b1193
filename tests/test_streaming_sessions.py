"""Batch-vs-stream equivalence of session windows: replaying the
events table through the micro-batch engine's stateful
``session_window`` aggregation must produce exactly the batch
session_window result for every session the final watermark closed —
including sessions the state store MERGED across micro-batch
boundaries, which is the property a lag-window implementation cannot
give a stream (it would need the whole history per key in one pass).
"""

from __future__ import annotations

import os
import time as _time
from datetime import timedelta

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.01")
GAP = 1800


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_session_window_matches_batch(spark, tmp_path):
    from eventhub_to_timescale_spark.sources.testdata import load_table

    raw_path = str(tmp_path / "raw")
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts")
    # event-time-ordered replay across triggers (file mtime orders the
    # file source) — same rationale as test_stream_batch_parity.py
    lo, hi = ev.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span = (hi - lo).total_seconds() + 1
    for i in range(4):
        a = lo + timedelta(seconds=span * i / 4)
        b = lo + timedelta(seconds=span * (i + 1) / 4)
        ev.filter((F.col("ts") >= a) & (F.col("ts") < b)).coalesce(
            1
        ).write.mode("append").parquet(raw_path)
        _time.sleep(0.05)

    def session_agg(df):
        return (
            df.groupBy(
                F.col("user_id"),
                F.session_window(F.col("ts"), f"{GAP} seconds").alias("sw"),
            )
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_close"),
                "n_events",
            )
        )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
        .withWatermark("ts", "1 seconds")
    )
    q = (
        session_agg(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    final_wm = q.lastProgress["eventTime"]["watermark"]
    emitted = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }

    batch = session_agg(spark.read.parquet(raw_path)).collect()
    wm_ts = F.to_timestamp(F.lit(final_wm.replace("T", " ").rstrip("Z")))
    cutoff = spark.range(1).select(wm_ts.alias("wm")).collect()[0]["wm"]
    expect = {tuple(r) for r in batch if r["session_close"] <= cutoff}
    held = {tuple(r) for r in batch if r["session_close"] > cutoff}

    assert emitted == expect
    assert len(emitted) > 0.9 * len(batch)  # the stream did the bulk
    assert emitted.isdisjoint(held)

    # cross-check against the batch operator surface: session_window
    # agreement with sessionize_native is definitional (same construct),
    # and sessionize_native vs the lag-window sessionize is covered by
    # tests/test_sessions_lm.py — so closed-stream sessions == the
    # engine's sessionization for every drained key.

"""Batch-vs-stream equivalence of the windowed aggregation: replaying
the sf0.01 events table through the streaming envelope→conditions→
window DAG must produce exactly the batch DAG's windows, modulo the
append-mode emission rule (a window emits once the watermark passes
its end).

This is the gate-adjacent evidence VERDICT r5 #6 asked for: the same
logical plan executed by the micro-batch engine and the batch engine
agree row-for-row on every closed window, and the held-back remainder
is exactly the set of windows the final watermark had not yet closed.
"""

from __future__ import annotations

import os
from datetime import timedelta

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.01")


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_window_agg_matches_batch(spark, tmp_path):
    from eventhub_to_timescale_spark.ingest.envelope import parse_envelope
    from eventhub_to_timescale_spark.ingest.router import route_to_records
    from eventhub_to_timescale_spark.sinks.conditions import (
        records_to_conditions,
    )
    from eventhub_to_timescale_spark.sources.synth import (
        events_to_emon_envelopes,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.pipeline import (
        read_raw_stream,
        stream_to_conditions,
        streaming_bucket_avg,
    )

    raw_path = str(tmp_path / "raw")
    ev = load_table(spark, SF_DIR, "events")
    # Replay must be (coarsely) event-time ordered ACROSS triggers, as
    # a real hub's partition drain is: four contiguous time slices
    # written sequentially (file mtime orders the file source), one
    # file each → four micro-batches. Random file assignment would
    # scatter January across batches and the watermark would discard
    # most rows as late — a replay artifact, not an engine property.
    import time as _time

    lo, hi = ev.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span = (hi - lo).total_seconds() + 1
    for i in range(4):
        a = lo + timedelta(seconds=span * i / 4)
        b = lo + timedelta(seconds=span * (i + 1) / 4)
        events_to_emon_envelopes(
            ev.filter((F.col("ts") >= a) & (F.col("ts") < b))
        ).coalesce(1).write.mode("append").parquet(raw_path)
        _time.sleep(0.05)  # distinct mtimes -> deterministic order

    # --- streaming run: 4 file-batches, tight watermark so (almost)
    # every window closes and emits before the stream drains
    agg = streaming_bucket_avg(
        stream_to_conditions(
            read_raw_stream(spark, raw_path, max_files_per_trigger=1),
            watermark="1 seconds",
            deterministic_ids=True,
        ),
        of="P1",
        bucket_seconds=900,
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    final_wm = q.lastProgress["eventTime"]["watermark"]  # ISO-8601 UTC
    emitted = {
        (r["measurement_subject"], r["time"], round(r["avg_value"], 9))
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }

    # --- batch run: the SAME raw files through the batch DAG
    raw_b = spark.read.parquet(raw_path)
    wide = records_to_conditions(
        route_to_records(parse_envelope(raw_b, deterministic_ids=True)),
        with_unique_id=False,
    )
    batch = (
        wide.filter(F.col("measurement_of") == "P1")
        .groupBy(
            "measurement_subject",
            F.window(F.col("timestamp"), "900 seconds").alias("w"),
        )
        .agg(F.avg("measurement_number").alias("avg_value"))
        .select(
            "measurement_subject",
            F.col("w.start").alias("time"),
            F.col("w.end").alias("t_end"),
            "avg_value",
        )
        .collect()
    )
    wm_ts = F.to_timestamp(F.lit(final_wm.replace("T", " ").rstrip("Z")))
    cutoff = spark.range(1).select(wm_ts.alias("wm")).collect()[0]["wm"]
    expect = {
        (r["measurement_subject"], r["time"], round(r["avg_value"], 9))
        for r in batch
        if r["t_end"] <= cutoff
    }
    held = {
        (r["measurement_subject"], r["time"]) for r in batch
        if r["t_end"] > cutoff
    }

    assert emitted == expect
    # sanity: the stream really computed the bulk of the data, and the
    # held-back remainder is only the watermark tail
    assert len(emitted) > 0.9 * len(batch)
    assert {(s, t) for s, t, _ in emitted}.isdisjoint(held)

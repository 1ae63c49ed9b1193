"""End-to-end streaming latency proof (VERDICT r1 #8): time an
``availableNow`` run of the full envelope→conditions→windowed-agg DAG
over the sf0.1 synthetic message set, and report per-micro-batch
trigger latencies from the query progress log.

Usage: python scripts/stream_latency.py [sf_dir] [n_files]

Writes nothing to the repo — prints one JSON line:
{"rows_in": N, "wall_s": ..., "msgs_per_s": ..., "batches": K,
 "batch_ms": {"min":..,"p50":..,"max":..}, "emitted_windows": M}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventhub_to_timescale_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from eventhub_to_timescale_spark.sources.synth import events_to_emon_envelopes
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.pipeline import (
        read_raw_stream,
        stream_to_conditions,
        streaming_bucket_avg,
    )

    spark = get_spark(app_name="stream-latency")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="streamlat_")
    raw_path = f"{tmp}/raw"
    ev = load_table(spark, sf_dir, "events")
    # n_files file-source files → n_files micro-batches (one per
    # trigger), mimicking Event Hub partition drain. Slices are
    # CONTIGUOUS TIME RANGES written in order (mtime orders the file
    # source): a replay that scatters event time across batches would
    # have the watermark discard most rows as late — an artifact of
    # random file assignment, not of the engine.
    from datetime import timedelta

    from pyspark.sql import functions as F

    lo, hi = ev.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span = (hi - lo).total_seconds() + 1
    for i in range(n_files):
        a = lo + timedelta(seconds=span * i / n_files)
        b = lo + timedelta(seconds=span * (i + 1) / n_files)
        events_to_emon_envelopes(
            ev.filter((F.col("ts") >= a) & (F.col("ts") < b))
        ).coalesce(1).write.mode("append").parquet(raw_path)
        time.sleep(0.05)
    n_msgs = spark.read.parquet(raw_path).count()

    agg = streaming_bucket_avg(
        stream_to_conditions(
            read_raw_stream(spark, raw_path, max_files_per_trigger=1),
            watermark="30 minutes",
        ),
        of="P1",
        bucket_seconds=900,
    )
    t0 = time.perf_counter()
    q = (
        agg.writeStream.format("parquet")
        .option("path", f"{tmp}/out")
        .option("checkpointLocation", f"{tmp}/ck")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    while q.isActive:
        time.sleep(0.2)
    wall = time.perf_counter() - t0
    final_wm = (q.lastProgress.get("eventTime") or {}).get("watermark")
    emitted_df = spark.read.parquet(f"{tmp}/out")
    emitted = emitted_df.count()

    # batch-vs-stream parity: the same raw files through the batch DAG
    # must reproduce every emitted window value; the stream may only
    # lack windows the final watermark left open (VERDICT r5 #6)
    from eventhub_to_timescale_spark.ingest.envelope import parse_envelope
    from eventhub_to_timescale_spark.ingest.router import route_to_records
    from eventhub_to_timescale_spark.sinks.conditions import (
        records_to_conditions,
    )

    wide = records_to_conditions(
        route_to_records(
            parse_envelope(spark.read.parquet(raw_path), deterministic_ids=True)
        ),
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
    cutoff = spark.range(1).select(
        F.to_timestamp(
            F.lit((final_wm or "1970-01-01T00:00:00.000Z")
                  .replace("T", " ").rstrip("Z"))
        ).alias("wm")
    ).collect()[0]["wm"]
    got = {
        (r["measurement_subject"], r["time"], round(r["avg_value"], 9))
        for r in emitted_df.collect()
    }
    want_closed = {
        (r["measurement_subject"], r["time"], round(r["avg_value"], 9))
        for r in batch
        if r["t_end"] <= cutoff
    }
    windows_match = got == want_closed

    batch_ms = sorted(
        p["durationMs"]["triggerExecution"]
        for p in q.recentProgress
        if p["numInputRows"] > 0
    )
    stats = (
        {
            "min": batch_ms[0],
            "p50": batch_ms[len(batch_ms) // 2],
            "max": batch_ms[-1],
        }
        if batch_ms
        else {}
    )
    print(
        json.dumps(
            {
                "rows_in": n_msgs,
                "wall_s": round(wall, 2),
                "msgs_per_s": round(n_msgs / wall),
                "batches": len(batch_ms),
                "batch_ms": stats,
                "emitted_windows": emitted,
                "batch_windows_total": len(batch),
                "windows_match": windows_match,
                "final_watermark": final_wm,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()

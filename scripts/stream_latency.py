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
    # trigger), mimicking Event Hub partition drain
    events_to_emon_envelopes(ev).repartition(n_files).write.parquet(raw_path)
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
    emitted = spark.read.parquet(f"{tmp}/out").count()

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
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Stream-vs-batch equivalence of the as-of enrichment: replaying a
measurement stream and a probe stream through the two-scalar-state
streaming operator must emit EXACTLY the batch ``asof_join`` rows —
the carried (value, time) pair is the only state the as-of semantics
need, so the streaming path holds 2 scalars per subject where the
batch path sorts full history.

Replay honors the ordered-arrival contract ACROSS THE UNION: each
side's files are sliced by that side's own event time on one shared
boundary grid (probes look back span/8, so their slice is taken on
probe_time, not the underlying event ts) — batch i then contains only
rows with event time in [a_i, b_i) from both sides, and the merged
arrival order is globally time-ordered per key.
"""

from __future__ import annotations

import os
import time as _time
from datetime import timedelta

import pytest
from conftest import drain_stateful_stream
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.01")


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_asof_equals_batch(spark, tmp_path):
    from eventhub_to_timescale_spark.operators.asof import asof_join
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.stateful import (
        streaming_asof_enrich,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    lo, hi = ev.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span = (hi - lo).total_seconds() + 1

    conds = ev.select(
        F.col("ts").alias("timestamp"),
        F.concat(
            F.lit("user_"), (F.col("user_id") % 7).cast("string")
        ).alias("measurement_subject"),
        F.lit("value").alias("measurement_of"),
        F.col("value").cast("double").alias("measurement_number"),
    )
    # probes look back span/8 — a genuinely cross-micro-batch lookback
    probes = ev.filter(F.col("event_id") % 5 == 0).select(
        F.col("event_id").alias("probe_id"),
        F.concat(
            F.lit("user_"), (F.col("user_id") % 7).cast("string")
        ).alias("measurement_subject"),
        (
            F.col("ts") + F.expr(f"INTERVAL {int(span / 8)} SECONDS")
        ).alias("probe_time"),
    )

    cond_path = str(tmp_path / "cond")
    probe_path = str(tmp_path / "probe")
    # one shared boundary grid, each side sliced by ITS OWN event time
    # (probe_time extends past hi by span/8, so the grid covers it)
    for i in range(5):
        a = lo + timedelta(seconds=span * i * 3 / 8)
        b = lo + timedelta(seconds=span * (i + 1) * 3 / 8)
        conds.filter(
            (F.col("timestamp") >= a) & (F.col("timestamp") < b)
        ).coalesce(1).write.mode("append").parquet(cond_path)
        probes.filter(
            (F.col("probe_time") >= a) & (F.col("probe_time") < b)
        ).coalesce(1).write.mode("append").parquet(probe_path)
        _time.sleep(0.05)

    cond_stream = (
        spark.readStream.schema(conds.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(cond_path)
    )
    probe_stream = (
        spark.readStream.schema(probes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(probe_path)
    )
    q = (
        streaming_asof_enrich(probe_stream, cond_stream, "value")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful_stream(q)

    def keyed(rows):
        return {
            (r.probe_id, r.measurement_subject): (
                r.probe_time,
                r.asof_time,
                r.asof_value,
            )
            for r in rows
        }

    got = keyed(spark.read.parquet(str(tmp_path / "out")).collect())
    want = keyed(
        asof_join(
            spark.read.parquet(probe_path),
            spark.read.parquet(cond_path),
            "value",
        ).collect()
    )
    assert set(got) == set(want) and len(want) > 1000
    diffs = [k for k in want if got[k] != want[k]]
    assert diffs == [], diffs[:5]

"""Batch-vs-stream equivalence of the Toolkit counter-delta rollup:
replaying the events table through the micro-batch engine's
``applyInPandasWithState`` counter operator must re-aggregate to
EXACTLY the batch ``counter_delta`` result — every sample contributes
once, the one-row-per-key state carries the previous sample across
micro-batch boundaries, so ``sum(partial_delta)`` per (subject,
bucket) over the emitted partials equals the batch rollup with no
watermark-cut carve-out (r6 verdict ask #5).
"""

from __future__ import annotations

from conftest import drain_stateful_stream

import os
import time as _time
from datetime import timedelta

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.01")
BUCKET = 21600


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_counter_delta_reaggregates_to_batch(spark, tmp_path):
    from eventhub_to_timescale_spark.operators.toolkit import counter_delta
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.stateful import (
        streaming_counter_delta,
    )

    raw_path = str(tmp_path / "raw")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    # event-time-ordered replay across triggers (file mtime orders the
    # file source) — the per-key ordered-arrival contract the stateful
    # operator documents; same mechanism as test_streaming_sessions.py
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

    def as_conditions(df):
        return df.select(
            F.col("ts").alias("timestamp"),
            F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias(
                "measurement_subject"
            ),
            F.lit("value").alias("measurement_of"),
            (F.col("event_id") * 4).alias("measurement_unique_id"),
            F.col("value").alias("measurement_number"),
        )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
        .withWatermark("ts", "1 seconds")
    )
    q = (
        streaming_counter_delta(
            as_conditions(stream), bucket_seconds=BUCKET
        )
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful_stream(q)

    emitted = (
        spark.read.parquet(str(tmp_path / "out"))
        .groupBy("measurement_subject", "time")
        .agg(F.round(F.sum("partial_delta"), 6).alias("counter_delta"))
        .collect()
    )
    got = {
        (r["measurement_subject"], r["time"]): r["counter_delta"]
        for r in emitted
    }

    batch = counter_delta(
        as_conditions(spark.read.parquet(raw_path)),
        bucket_seconds=BUCKET,
    ).collect()
    want = {
        (r["measurement_subject"], r["time"]): r["counter_delta"]
        for r in batch
    }

    assert len(want) > 100  # non-trivial surface at sf0.01
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6), k

    # state really crossed micro-batch boundaries: at least one
    # subject emitted partials in more than one micro-batch file yet
    # re-aggregated exactly — i.e. some bucket was split across
    # triggers or some subject spans triggers
    per_subject_rows = (
        spark.read.parquet(str(tmp_path / "out"))
        .groupBy("measurement_subject")
        .count()
        .filter(F.col("count") > F.lit(1))
        .count()
    )
    assert per_subject_rows > 0


TOL = 7200


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_heartbeat_reaggregates_to_batch(spark, tmp_path):
    from eventhub_to_timescale_spark.operators.toolkit import (
        heartbeat_uptime,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.stateful import (
        streaming_heartbeat,
    )

    raw_path = str(tmp_path / "raw")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "value"
    )
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

    def as_conditions(df):
        return df.select(
            F.col("ts").alias("timestamp"),
            F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias(
                "measurement_subject"
            ),
            F.lit("value").alias("measurement_of"),
            (F.col("event_id") * 4).alias("measurement_unique_id"),
            F.col("value").alias("measurement_number"),
        )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
        .withWatermark("ts", "1 seconds")
    )
    q = (
        streaming_heartbeat(
            as_conditions(stream), tolerance_seconds=TOL
        )
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful_stream(q)

    # re-aggregate the partials with the operator's documented formula
    got = {
        r["measurement_subject"]: (
            r["n"],
            r["cov"] + TOL,
            r["mx"] + TOL - r["mn"],
        )
        for r in (
            spark.read.parquet(str(tmp_path / "out"))
            .groupBy("measurement_subject")
            .agg(
                F.sum("n_beats").alias("n"),
                F.sum("covered_partial_s").alias("cov"),
                F.min("min_t").alias("mn"),
                F.max("max_t").alias("mx"),
            )
            .collect()
        )
    }
    want = {
        r["measurement_subject"]: (
            r["n_beats"],
            r["covered_s"],
            r["span_s"],
        )
        for r in heartbeat_uptime(
            as_conditions(spark.read.parquet(raw_path)),
            tolerance_seconds=TOL,
        ).collect()
    }
    assert len(want) > 100
    assert got == want

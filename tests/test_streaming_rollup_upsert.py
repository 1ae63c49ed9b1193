"""Streaming incremental-materialized-view proof for rollup_upsert:
replaying the events table in micro-batches through a foreachBatch
that maintains a persisted rollup via rollup_upsert must converge to
EXACTLY the one-shot batch rollup — the continuous-aggregate refresh
loop (each batch is a "late arrival" against the rollup built so far,
so the additivity merge is exercised at every trigger, not just once).
"""

from __future__ import annotations

import os
from datetime import timedelta

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.01")
BUCKET = 21600

_ROLLUP_SCHEMA = (
    "measurement_subject string, measurement_of string, "
    "bucket_time timestamp, n bigint, sum_value double, "
    "min_value double, max_value double"
)


def _as_conditions(ev):
    return ev.select(
        F.col("ts").alias("timestamp"),
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias(
            "measurement_subject"
        ),
        F.lit("value").alias("measurement_of"),
        F.col("value").alias("measurement_number"),
    )


def _normalized(rows):
    return sorted(
        (
            r["measurement_subject"],
            r["measurement_of"],
            r["bucket_time"],
            r["n"],
            round(r["sum_value"], 6),
            r["min_value"],
            r["max_value"],
        )
        for r in rows
    )


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_maintained_rollup_equals_batch(spark, tmp_path):
    from eventhub_to_timescale_spark.operators.rollup import (
        rollup_conditions,
        rollup_upsert,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table

    raw_path = str(tmp_path / "raw")
    rollup_path = str(tmp_path / "rollup")
    ev = load_table(spark, SF_DIR, "events").select(
        "ts", "user_id", "value"
    ).filter(F.col("value").isNotNull())
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

    versions = {"n": 0}

    def refresh(batch_df, batch_id):
        cond = _as_conditions(batch_df)
        if versions["n"] == 0:
            merged = rollup_conditions(cond, BUCKET)
        else:
            base = spark.read.schema(_ROLLUP_SCHEMA).parquet(
                f"{rollup_path}/v{versions['n']}"
            )
            merged = rollup_upsert(base, cond, BUCKET)
        versions["n"] += 1
        merged.write.parquet(f"{rollup_path}/v{versions['n']}")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
        .writeStream.foreachBatch(refresh)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination(300)
    assert versions["n"] >= 2, "expected multiple micro-batches"

    maintained = spark.read.schema(_ROLLUP_SCHEMA).parquet(
        f"{rollup_path}/v{versions['n']}"
    )
    batch = rollup_conditions(_as_conditions(ev), BUCKET)
    assert _normalized(maintained.collect()) == _normalized(batch.collect())

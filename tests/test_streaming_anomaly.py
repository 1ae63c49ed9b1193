"""Stream-static MAD anomaly apply (streaming/anomaly.py): replaying
the events table as a stream and scoring against the batch-fitted
stats frame must flag EXACTLY the batch mad_outliers rows."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.01")


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_apply_equals_batch(spark, tmp_path):
    from eventhub_to_timescale_spark.operators.anomaly import (
        mad_outliers,
        mad_stats,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.anomaly import (
        streaming_mad_outliers,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    want = {
        (r["event_id"], r["event_type"], r["value"])
        for r in mad_outliers(ev).collect()
    }
    assert want  # non-degenerate fixture

    # replay the same rows as a 4-slice file stream
    src = str(tmp_path / "stream_src")
    ev.withColumn("slice", F.col("event_id") % 4).write.partitionBy(
        "slice"
    ).parquet(src)
    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 2)
        .parquet(src + "/slice=*")
    )
    stats = mad_stats(ev)  # fit on history, frozen for the stream
    out = streaming_mad_outliers(stream, stats)
    q = (
        out.writeStream.format("memory")
        .queryName("mad_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r["event_id"], r["event_type"], r["value"])
        for r in spark.sql("SELECT * FROM mad_stream").collect()
    }
    assert got == want


def test_rejects_negative_k(spark):
    from eventhub_to_timescale_spark.streaming.anomaly import (
        streaming_mad_outliers,
    )

    df = spark.createDataFrame([], "event_id long, event_type string, value double")
    with pytest.raises(ValueError):
        streaming_mad_outliers(df, df, k=-1)

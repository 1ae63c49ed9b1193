"""Stream-static seasonal anomaly apply: the live-scorable
(leakage-free) deseasonalizer must flag EXACTLY the rows the batch
pipeline flags — FIT once on history (phase profile + MAD of the
deviations), APPLY to the same rows replayed as a stream.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.001")


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_flags_equal_batch_flags(spark, tmp_path):
    from eventhub_to_timescale_spark.operators.anomaly import (
        mad_outliers,
        mad_stats,
    )
    from eventhub_to_timescale_spark.operators.seasonal import (
        deseasonalized_rows,
        phase_profile,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.anomaly import (
        streaming_deseasonalized_outliers,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    # FIT on history
    profile = phase_profile(events)
    dev = deseasonalized_rows(events, profile)
    stats = mad_stats(dev, group_col="event_type", value_col="dev")
    # batch flags (mad_outliers emits the scored column, here "dev")
    want = sorted(
        (r["event_id"], r["event_type"], r["dev"])
        for r in mad_outliers(
            dev, group_col="event_type", value_col="dev", id_col="event_id"
        ).collect()
    )
    assert want, "fixture produced no batch outliers — test is vacuous"

    # APPLY to the same rows replayed as a stream (frozen model frames)
    raw_path = str(tmp_path / "raw")
    events.write.parquet(raw_path)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(raw_path)
    )
    q = (
        streaming_deseasonalized_outliers(stream, profile, stats)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got_rows = spark.read.parquet(str(tmp_path / "out")).collect()
    got = sorted(
        (r["event_id"], r["event_type"], r["dev"]) for r in got_rows
    )
    assert got == want
    # and the emitted deviations are finite, deseasonalized values
    assert all(math.isfinite(r["dev"]) for r in got_rows)

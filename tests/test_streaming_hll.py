"""Stream-vs-batch equivalence of the portable HLL distinct sketch:
replaying the events table through the register-state streaming
operator must end at EXACTLY the batch ``hll_distinct_portable``
row per stream — registers are exact integers under a commutative
max (so, uniquely among the stateful operators, NO ordered-arrival
contract is needed), and the estimate is the same single IEEE
division on both paths.
"""

from __future__ import annotations

from conftest import drain_stateful_stream

import os
import time as _time
from datetime import timedelta

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.01")


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_hll_final_estimate_equals_batch(spark, tmp_path):
    from eventhub_to_timescale_spark.operators.sketches import (
        hll_distinct_portable,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.stateful import (
        streaming_hll_distinct,
    )

    raw_path = str(tmp_path / "raw")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    # shuffled split across triggers ON PURPOSE (event_id mod, not
    # time ranges): register max is order-independent, so the stream
    # must converge even with out-of-order arrival
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(raw_path)
        _time.sleep(0.05)

    def as_conditions(df):
        return df.select(
            F.col("ts").alias("timestamp"),
            F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias(
                "measurement_subject"
            ),
            # two streams so more than one state key exists
            F.when(F.col("event_id") % 2 == 0, "value")
            .otherwise("aux")
            .alias("measurement_of"),
        )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
        .withWatermark("ts", "1 seconds")
    )
    q = (
        streaming_hll_distinct(as_conditions(stream))
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful_stream(q)

    emitted = spark.read.parquet(str(tmp_path / "out"))
    # the last emission per stream is the converged sketch; register
    # sets grow monotonically, so "last" = max nonzero_registers,
    # ties broken by the estimate being identical
    final = {
        r["measurement_of"]: (r["nonzero_registers"], r["est_distinct"])
        for r in emitted.orderBy("nonzero_registers").collect()
    }

    batch = hll_distinct_portable(
        as_conditions(spark.read.parquet(raw_path))
    ).collect()
    want = {
        r["measurement_of"]: (r["nonzero_registers"], r["est_distinct"])
        for r in batch
    }

    assert set(final) == set(want) and len(want) == 2
    for k in want:
        assert final[k] == want[k], k

    # the state genuinely accumulated across micro-batches: some
    # stream emitted more than once with growing register counts
    multi = (
        emitted.groupBy("measurement_of")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("nonzero_registers").alias("d"))
        .filter((F.col("n") > 1))
        .count()
    )
    assert multi > 0

"""Stream-vs-batch equivalence of the portable count-min sketch:
replaying the events table through the cell-state streaming operator
must converge, per group, to EXACTLY the batch ``cms_cells`` matrix —
cell addition is an exact-integer commutative fold (like the HLL
register max and unlike the ordered stateful operators), so no
ordered-arrival contract is needed and shuffled micro-batches are
replayed ON PURPOSE.
"""

from __future__ import annotations

import os
import time as _time

import pytest
from conftest import drain_stateful_stream
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.01")


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_cms_final_cells_equal_batch(spark, tmp_path):
    from eventhub_to_timescale_spark.operators.sketches import (
        CMS_D,
        CMS_W,
        cms_cells,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.stateful import (
        streaming_cms_cells,
    )

    raw_path = str(tmp_path / "raw")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    # shuffled split across triggers (event_id mod, not time ranges):
    # the cell fold must converge regardless of arrival order
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(raw_path)
        _time.sleep(0.05)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
        .withWatermark("ts", "1 seconds")
    )
    q = (
        streaming_cms_cells(stream, "user_id", group_col="event_type")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful_stream(q)

    emitted = spark.read.parquet(str(tmp_path / "out"))
    # `n` is monotone per group, so latest emission = max n
    final = {
        r["sketch_group"]: list(r["cells"])
        for r in emitted.orderBy("n").collect()
    }

    batch_ev = spark.read.parquet(raw_path)
    groups = [
        r["event_type"]
        for r in batch_ev.select("event_type").distinct().collect()
    ]
    assert set(final) == set(groups) and len(groups) >= 2
    for grp in groups:
        want = [0] * (CMS_D * CMS_W)
        rows = cms_cells(
            batch_ev.filter(F.col("event_type") == grp), "user_id"
        ).collect()
        for r in rows:
            want[r["j"] * CMS_W + r["bucket"]] = r["c"]
        assert final[grp] == want, grp

    # state genuinely accumulated: some group emitted >1 row with
    # growing n
    multi = (
        emitted.groupBy("sketch_group")
        .agg(F.countDistinct("n").alias("d"))
        .filter(F.col("d") > 1)
        .count()
    )
    assert multi > 0

"""Stream-vs-batch equivalence of the KMV θ-sketch: replaying the
documents table through the streaming sketch operator must converge,
per source, to EXACTLY the batch ``kmv_sketch`` hash set — union-then-
rank is commutative and idempotent (like the HLL register max), so
shuffled micro-batches are replayed ON PURPOSE — and feeding the
converged streaming state into ``kmv_overlap_from_sketches`` must
reproduce ``kmv_source_overlap``'s pairwise estimates exactly.
"""

from __future__ import annotations

import os
import time as _time

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.001")
K = 64


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_kmv_converges_to_batch_sketch(spark, tmp_path):
    from eventhub_to_timescale_spark.operators.sketches import (
        kmv_overlap_from_sketches,
        kmv_sketch,
        kmv_source_overlap,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.stateful import (
        streaming_kmv_sketch,
    )

    raw_path = str(tmp_path / "raw")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    # shuffled split across triggers (doc_id mod, not contiguous
    # ranges): the union-then-rank fold must converge regardless of
    # arrival order; copy 0 is also appended TWICE to prove
    # idempotence under replay
    for i in (0, 1, 2, 0):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(raw_path)
        _time.sleep(0.05)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
    )
    q = (
        streaming_kmv_sketch(stream, k=K)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # stateful applyInPandasWithState + availableNow never
    # self-terminates (see conftest.drain_stateful_stream): a bare
    # awaitTermination(300) burned its FULL timeout churning zero-input
    # batches — 305 s measured for a test whose data work is ~10 s
    from conftest import drain_stateful_stream

    drain_stateful_stream(q)

    emitted = spark.read.parquet(str(tmp_path / "out"))
    latest = (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                __import__(
                    "pyspark.sql.window", fromlist=["Window"]
                ).Window.partitionBy("src").orderBy(F.col("n").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("src", "hashes")
    )
    got = {r["src"]: list(r["hashes"]) for r in latest.collect()}
    batch = kmv_sketch(docs, k=K)
    want: dict[str, list[int]] = {}
    for r in batch.collect():
        want.setdefault(r["src"], []).append(r["h"])
    want = {s: sorted(v) for s, v in want.items()}
    assert got == want and len(got) >= 2

    # the converged streaming state drives the SAME pairwise
    # estimator to the batch operator's exact output
    sketch_frame = latest.select(
        "src", F.explode("hashes").alias("h")
    )
    got_pairs = sorted(
        map(tuple, kmv_overlap_from_sketches(sketch_frame, K).collect())
    )
    want_pairs = sorted(
        map(tuple, kmv_source_overlap(docs, k=K).collect())
    )
    assert got_pairs == want_pairs and len(got_pairs) > 0

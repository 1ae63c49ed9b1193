"""Streaming Misra–Gries heavy hitters: replay the documents table's
token occurrences through the stateful operator in SHUFFLED
micro-batches (including one replayed split — MG merges are additive,
so a replay legitimately changes counters; the GUARANTEE must still
hold against the replayed totals) and pin the two order-free MG
bounds against exact per-source counts:

1. completeness — every term with true frequency > n/(k+1) appears in
   the final summary;
2. soundness — every reported counter c satisfies
   c ≤ true ≤ c + (n − Σ counters)/(k+1).
"""

from __future__ import annotations

import os
import time as _time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.001")
K = 32
_TOKEN_RE = r"[a-z]+|[0-9]+"


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_mg_guarantee_holds(spark, tmp_path):
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    raw_path = str(tmp_path / "raw")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    occ = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_TOKEN_RE), 0)
        ).alias("term"),
    )
    # shuffled splits + one REPLAYED split (0 twice): totals include
    # the replay — MG folds are additive, the guarantee is against
    # whatever actually streamed through
    for i in (2, 0, 1, 0):
        occ.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(raw_path)
        _time.sleep(0.05)

    streamed = spark.read.parquet(raw_path)  # exact replayed totals
    stream = (
        spark.readStream.schema(occ.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
    )
    q = (
        streaming_heavy_hitters(stream, k=K)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    from conftest import drain_stateful_stream

    drain_stateful_stream(q)

    latest = (
        spark.read.parquet(str(tmp_path / "out"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.col("n").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("src", "n", "terms", "counts")
    )
    summaries = {
        r["src"]: (r["n"], dict(zip(r["terms"], r["counts"])))
        for r in latest.collect()
    }
    assert len(summaries) >= 2

    exact = {}
    for r in (
        streamed.groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ):
        exact.setdefault(r["source"], {})[r["term"]] = r["c"]

    for src, (n, mg) in summaries.items():
        true = exact[src]
        assert n == sum(true.values()), f"{src}: row count drift"
        assert 0 < len(mg) <= K
        slack = (n - sum(mg.values())) / (K + 1)
        # completeness: true heavy hitters all present
        for t, c in true.items():
            if c > n / (K + 1):
                assert t in mg, f"{src}: heavy hitter '{t}' missing"
        # soundness: counters undercount by at most the MG slack
        for t, c in mg.items():
            assert c <= true.get(t, 0), f"{src}/{t}: counter overcounts"
            assert true[t] - c <= slack, (
                f"{src}/{t}: undercount {true[t] - c} exceeds slack {slack}"
            )

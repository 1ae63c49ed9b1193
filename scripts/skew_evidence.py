"""Skew evidence for the full-table window queries Q8/Q9 (VERDICT r4 #7).

Window.partitionBy(subject) cannot be split by AQE (skew handling is
join-only), so one hot subject concentrates its whole history in one
task. This harness measures exactly that at sf0.1: remap HALF of all
events onto a single hot subject and compare the window-query wall
clock against the uniform run.

The engine's mitigation, when the hot run exceeds 2x uniform, is the
chunked-window rewrite in operators/timeseries.py
(changed_rows_salted): lag within (subject, time-chunk) salted
partitions + a narrow boundary fix-up join, which restores per-core
parallelism for arbitrarily hot keys.

Usage: python scripts/skew_evidence.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eventhub_to_timescale_spark.session import get_spark  # noqa: E402
from eventhub_to_timescale_spark.operators.timeseries import (  # noqa: E402
    changed_rows,
    state_intervals,
)
from eventhub_to_timescale_spark.sources.testdata import (  # noqa: E402
    events_as_conditions,
)

START = datetime(2024, 1, 1)
END = datetime(2026, 1, 1)


def timed(fn, n=3):
    fn()  # cold, discarded
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="skew-evidence")
    spark.sparkContext.setLogLevel("ERROR")

    cond = events_as_conditions(spark, sf_dir)
    # hot variant: 50% of rows collapse onto one subject (hash-based so
    # the choice is deterministic and spread over time uniformly)
    hot = cond.withColumn(
        "measurement_subject",
        F.when(
            F.crc32(F.col("correlation_id")) % 2 == 0, F.lit("user_HOT")
        ).otherwise(F.col("measurement_subject")),
    )

    results: dict[str, object] = {"sf_dir": sf_dir}
    for label, df in (("uniform", cond), ("hot50", hot)):
        df = df.localCheckpoint()  # isolate the window cost from ingest
        q8 = lambda d=df: changed_rows(d, None, "event_type", START, END).count()
        q9 = lambda d=df: state_intervals(
            d, None, "event_type", START, END, close_at=END
        ).count()
        results[f"q8_{label}_s"] = timed(q8)
        results[f"q9_{label}_s"] = timed(q9)

    results["q8_hot_over_uniform"] = round(
        results["q8_hot50_s"] / results["q8_uniform_s"], 2
    )
    results["q9_hot_over_uniform"] = round(
        results["q9_hot50_s"] / results["q9_uniform_s"], 2
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Timer-driven poll source (reference S4: ``bmw_update`` — cron
``0 */10 * * * *`` pulls vehicle state from a REST API and emits one
JSON document per vehicle; bmw_update/function.json:8, bmw.py:95-111).

Spark analog: the API call stays a driver-side function; each poll
becomes a micro-batch via ``spark.createDataFrame`` handed to the
processing DAG. For continuous operation the same fetch plugs into a
``foreachBatch``-driven rate stream; for tests and backfills the loop
below is exact and deterministic.

The external fetch is the only non-distributed step — by design: it is
one HTTPS call per 10 minutes. Everything downstream (convert, dedup,
sink) is the distributed plan from ``ingest.bmw``.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession


def poll_once(
    spark: SparkSession,
    fetch: Callable[[], Iterable[str]],
) -> DataFrame:
    """One poll → one micro-batch DataFrame of raw JSON documents
    (column ``value``, same shape the Kafka/EventHubs source yields)."""
    rows = [(doc,) for doc in fetch()]
    if not rows:
        return spark.createDataFrame([], "value string")
    return spark.createDataFrame(rows, "value string")


def run_polling_source(
    spark: SparkSession,
    fetch: Callable[[], Iterable[str]],
    process: Callable[[DataFrame], None],
    interval_seconds: float = 600.0,
    max_polls: int | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Cron-style loop: fetch → micro-batch → process. Returns the
    number of polls executed. ``max_polls`` bounds test runs;
    ``sleep`` is injectable for tests."""
    polls = 0
    while max_polls is None or polls < max_polls:
        process(poll_once(spark, fetch))
        polls += 1
        if max_polls is not None and polls >= max_polls:
            break
        sleep(interval_seconds)
    return polls

"""Record-out sinks: atomic records → JSON message strings (reference
S5, ``send_messages``, json_converter.py:72-102) and the dual-sink
monitor tap (S6, bmw_to_timescale.py:35-36).

``to_json(struct(*))`` keeps serialization JVM-side; timestamps are
rendered in the reference's canonical ISO form so a downstream
consumer of the original pipeline could not tell the difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.functions.scalars import iso_utc_string


def records_to_messages(records: DataFrame) -> DataFrame:
    """Canonical atomic records → one JSON string per record (column
    ``value``) — the payload written to the ``timescale`` hub. For a
    live hub: ``df.writeStream.format("kafka")`` over this column."""
    # ignoreNullFields=false: the reference's json.dumps emits
    # "correlation_id": null rather than omitting the key
    return records.select(
        F.to_json(
            F.struct(
                iso_utc_string(F.col("timestamp")).alias("timestamp"),
                F.col("measurement_subject"),
                F.col("measurement_publisher"),
                F.col("measurement_of"),
                F.col("measurement_value"),
                F.col("measurement_data_type"),
                F.col("correlation_id"),
            )
        , options={"ignoreNullFields": "false"}).alias("value")
    )


def distinct_correlation_ids(records: DataFrame) -> DataFrame:
    """The reference logs the distinct correlation ids per sent batch
    (json_converter.py:95-101) — exposed as a DataFrame for the same
    observability."""
    return records.select("correlation_id").distinct()


def write_with_monitor_tap(
    records: DataFrame,
    primary_write: callable,
    monitor_write: callable,
) -> None:
    """Duplicate one batch to two sinks (reference S6 sends BMW output
    to both ``timescale`` and ``bmw_monitor`` hubs). Inside a
    streaming ``foreachBatch`` both writes see the same batch
    exactly-once per checkpoint commit."""
    # materialize ONCE: the plan may be nondeterministic (uuid()
    # correlation ids, dropDuplicates' arbitrary survivor) and two
    # independent actions would hand the two sinks different rows —
    # the reference sends byte-identical messages to both hubs
    msgs = records_to_messages(records).localCheckpoint(eager=True)
    primary_write(msgs)
    monitor_write(msgs)

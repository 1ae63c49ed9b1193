"""Normalized-record ingestion and validation.

- ``parse_record_messages``: the S3 source — consume the ``timescale``
  hub's JSON record messages (reference timeseries_to_timescale +
  shared_code/timeseries.json v2.0.0 single-record envelope) back into
  the canonical typed DataFrame. Closes the loop with
  ``sinks.messages.records_to_messages``.
- ``parse_record_batches``: the older v1.0.0 array-of-records batch
  envelope (reference test/timeseries.json — an array whose items are
  records); one message → many records via ``explode``.
- ``validate_records``: the sink-side JSON-Schema contract (reference
  timescale.py:105 + validate_all_fields_in_record :127-141) as a
  filter pair: 6 required fields, known type tag. Returns
  (valid, rejects) so callers route the dead letters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eventhub_to_timescale_spark.functions.scalars import parse_timestamp_any
from eventhub_to_timescale_spark.ingest.envelope import materialize
from eventhub_to_timescale_spark.schema import PAYLOAD_TYPES

_RECORD_STRUCT = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),
        T.StructField("measurement_subject", T.StringType()),
        T.StructField("measurement_publisher", T.StringType()),
        T.StructField("measurement_of", T.StringType()),
        T.StructField("measurement_value", T.StringType()),
        T.StructField("measurement_data_type", T.StringType()),
        T.StructField("correlation_id", T.StringType()),
    ]
)


def _project(df: DataFrame, rec: str) -> DataFrame:
    return df.select(
        parse_timestamp_any(F.col(f"{rec}.timestamp")).alias("timestamp"),
        F.col(f"{rec}.measurement_subject").alias("measurement_subject"),
        F.col(f"{rec}.measurement_publisher").alias("measurement_publisher"),
        F.col(f"{rec}.measurement_of").alias("measurement_of"),
        F.col(f"{rec}.measurement_value").alias("measurement_value"),
        F.col(f"{rec}.measurement_data_type").alias("measurement_data_type"),
        F.col(f"{rec}.correlation_id").alias("correlation_id"),
    )


def parse_record_messages(raw_df: DataFrame, raw_col: str = "value") -> DataFrame:
    """One JSON record per message (v2.0.0) → canonical records."""
    df = materialize(
        raw_df, F.from_json(F.col(raw_col).cast("string"), _RECORD_STRUCT), "rec"
    )
    return _project(df, "rec")


def parse_record_batches(raw_df: DataFrame, raw_col: str = "value") -> DataFrame:
    """v1.0.0 array-of-records batch envelope → canonical records
    (one message explodes into many)."""
    arr = F.from_json(F.col(raw_col).cast("string"), T.ArrayType(_RECORD_STRUCT))
    df = raw_df.select(F.explode(arr).alias("rec"))
    return _project(df, "rec")


_REQUIRED = (
    "timestamp",
    "measurement_subject",
    "measurement_publisher",
    "measurement_of",
    "measurement_value",
    "measurement_data_type",
)


def _valid_predicate():
    pred = F.lit(True)
    for c in _REQUIRED:
        pred = pred & F.col(c).isNotNull()
    return pred & F.col("measurement_data_type").isin(*PAYLOAD_TYPES)


def validate_records(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (valid, rejects): the reference's closed-schema validation
    (6 required fields, correlation_id optional, type tag ∈ the 4
    payload types) as a declarative split."""
    pred = _valid_predicate()
    return records.filter(pred), records.filter(~F.coalesce(pred, F.lit(False)))

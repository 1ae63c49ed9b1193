"""Normalized-record ingestion and validation.

- ``parse_record_messages``: the S3 source — consume the ``timescale``
  hub's JSON record messages (reference timeseries_to_timescale +
  shared_code/timeseries.json v2.0.0 single-record envelope) back into
  the canonical typed DataFrame. Closes the loop with
  ``sinks.messages.records_to_messages``.
- ``parse_record_batches``: the older v1.0.0 array-of-records batch
  envelope (reference test/timeseries.json — an array whose items are
  records); one message → many records via ``explode_outer`` so a
  malformed batch still surfaces as a (raw, all-null) dead-letter row
  instead of vanishing.
- ``validate_records``: the sink-side JSON-Schema contract (reference
  timescale.py:105 + validate_all_fields_in_record:127-141) as a
  filter pair: 7 required fields (correlation_id included — the
  reference KeyErrors without it), known type tag. Returns
  (valid, rejects); reject rows keep the ``raw`` message when the
  input carried one, so dead letters are loggable/replayable.

Documented narrowings vs the reference validator (both supersets on
the accept side, flagged rather than hidden):
- ``from_json`` itself ignores unknown extra fields; pass
  ``strict=True`` to ``validate_records`` to enforce the schema's
  ``additionalProperties: false`` (timeseries.json:78) — the raw
  message's ``json_object_keys`` are checked against the declared
  column set and any extra-keyed message rides the reject channel.
  Batch (v1 array) messages are strict-checked only at the envelope
  level (per-element raw text isn't retained after the explode).
- timestamps are parsed with the engine's lenient parser (epoch or
  ISO), where the JSON Schema requires a date-time string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eventhub_to_timescale_spark.functions.scalars import parse_timestamp_any
from eventhub_to_timescale_spark.ingest.envelope import materialize
from eventhub_to_timescale_spark.schema import (
    ATOMIC_RECORD_COLUMNS,
    PAYLOAD_TYPES,
)

# wire-format struct: canonical column list, all strings (typed parse
# happens in _project) — derived from the single source of truth in
# schema.py so the lists cannot drift
_RECORD_STRUCT = T.StructType(
    [T.StructField(name, T.StringType()) for name in ATOMIC_RECORD_COLUMNS]
)


def _project(df: DataFrame, rec: str, keep_raw: bool = True) -> DataFrame:
    cols = [
        parse_timestamp_any(F.col(f"{rec}.timestamp")).alias("timestamp"),
        *[
            F.col(f"{rec}.{name}").alias(name)
            for name in ATOMIC_RECORD_COLUMNS
            if name != "timestamp"
        ],
    ]
    if keep_raw:
        cols.append(F.col("raw"))
    return df.select(*cols)


def parse_record_messages(raw_df: DataFrame, raw_col: str = "value") -> DataFrame:
    """One JSON record per message (v2.0.0) → canonical records, plus
    the original ``raw`` message for the dead-letter channel."""
    df = materialize(
        raw_df.withColumn("raw", F.col(raw_col).cast("string")),
        F.from_json(F.col(raw_col).cast("string"), _RECORD_STRUCT),
        "rec",
    )
    return _project(df, "rec")


def parse_record_batches(raw_df: DataFrame, raw_col: str = "value") -> DataFrame:
    """v1.0.0 array-of-records batch envelope → canonical records (one
    message explodes into many). ``explode_outer`` keeps a malformed
    batch as one (raw, nulls) row for the reject channel."""
    arr = F.from_json(F.col(raw_col).cast("string"), T.ArrayType(_RECORD_STRUCT))
    df = raw_df.withColumn("raw", F.col(raw_col).cast("string")).select(
        "raw", F.explode_outer(arr).alias("rec")
    )
    return _project(df, "rec")


# the reference requires all 7 fields at the sink
# (validate_all_fields_in_record, timescale.py:127-141; a missing
# correlation_id KeyErrors into the error channel)
_REQUIRED = tuple(ATOMIC_RECORD_COLUMNS)


def _valid_predicate():
    pred = F.lit(True)
    for c in _REQUIRED:
        pred = pred & F.col(c).isNotNull()
    return pred & F.col("measurement_data_type").isin(*PAYLOAD_TYPES)


def _no_extra_fields(raw):
    """``additionalProperties: false`` (timeseries.json:78): any key of
    the raw record object outside the declared 7 → invalid. Non-object
    raw text (the v1 batch array) has NULL ``json_object_keys`` and is
    exempted — elements were already shredded by then."""
    keys = F.json_object_keys(raw)
    has_extra = F.exists(keys, lambda k: ~k.isin(*_REQUIRED))
    return F.when(keys.isNull(), F.lit(True)).otherwise(~has_extra)


def validate_records(
    records: DataFrame, strict: bool = False
) -> tuple[DataFrame, DataFrame]:
    """→ (valid, rejects). ``strict=True`` additionally enforces the
    JSON Schema's ``additionalProperties: false`` against the ``raw``
    message text (no-op when the input carries no ``raw`` column).
    NOTE: the two returned frames are independent plans over the same
    input — a caller consuming both should ``persist()`` the input (or
    the parse upstream) to avoid re-parsing each message twice."""
    pred = _valid_predicate()
    if strict and "raw" in records.columns:
        pred = pred & _no_extra_fields(F.col("raw"))
    valid = records.filter(pred)
    rejects = records.filter(~F.coalesce(pred, F.lit(False)))
    if "raw" in records.columns:
        valid = valid.drop("raw")
    return valid, rejects

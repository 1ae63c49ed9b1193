"""Canonical schemas: envelope, atomic measurement record, conditions.

The engine's core IR is the *atomic measurement record* — one narrow EAV
row per (time, subject, metric) — mirroring the reference's 7-field
record dict (reference timeseries.py:14-40, JSON Schema
shared_code/timeseries.json:5-77) and its TimescaleDB ``conditions``
hypertable (reference db/create_table_and_roles.sql:35-46).

Design decisions vs the reference (Spark-first, not a port):
- timestamps are native ``TimestampType`` (UTC) end-to-end, not ISO
  strings; converted only at sink/oracle edges.
- the record carries the raw value as a string plus a type tag
  (``measurement_data_type`` ∈ number|string|boolean|geography); the
  long→wide pivot into 4 typed columns happens once at the sink
  (reference timescale.py:144-216), as a ``when/otherwise`` projection.
- geography is kept as (lat, lon) doubles plus a derived WKT string —
  no SRID math is needed because the reference only formats/validates
  (reference timescale.py:219-270).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Value types (reference timeseries.py:5-11, enum PayloadType)
# ---------------------------------------------------------------------------

TYPE_NUMBER = "number"
TYPE_STRING = "string"
TYPE_BOOLEAN = "boolean"
TYPE_GEOGRAPHY = "geography"

PAYLOAD_TYPES = (TYPE_NUMBER, TYPE_STRING, TYPE_BOOLEAN, TYPE_GEOGRAPHY)

# ---------------------------------------------------------------------------
# Message envelope (reference json_converter.py:166-172 + test fixtures):
# MQTT-style dict {topic, payload, qos, retain, timestamp}; payload is a
# JSON-encoded *string* (double-encoded) — parsed by a second from_json.
# ---------------------------------------------------------------------------

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("qos", T.IntegerType()),
        T.StructField("retain", T.IntegerType()),
        T.StructField("timestamp", T.StringType()),
    ]
)

# Column name used for PERMISSIVE-mode corrupt-record capture when
# parsing envelopes (reference drops malformed events with a log,
# json_converter.py:66-69; we keep them on an error channel instead).
CORRUPT_RECORD_COL = "_corrupt_record"

# ---------------------------------------------------------------------------
# Atomic measurement record (reference timeseries.py:32-40)
# ---------------------------------------------------------------------------

ATOMIC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), nullable=False),
        T.StructField("measurement_subject", T.StringType(), nullable=False),
        T.StructField("measurement_publisher", T.StringType(), nullable=False),
        T.StructField("measurement_of", T.StringType(), nullable=False),
        T.StructField("measurement_value", T.StringType(), nullable=True),
        T.StructField("measurement_data_type", T.StringType(), nullable=False),
        T.StructField("correlation_id", T.StringType(), nullable=True),
    ]
)

ATOMIC_RECORD_COLUMNS = [f.name for f in ATOMIC_RECORD_SCHEMA.fields]

# ---------------------------------------------------------------------------
# Wide `conditions` sink shape (reference db/create_table_and_roles.sql:35-46)
# measurement_location holds WKT "SRID=4326;POINT(lon lat)" — lon first
# (reference timescale.py:270).
# ---------------------------------------------------------------------------

CONDITIONS_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), nullable=False),
        T.StructField("measurement_subject", T.StringType(), nullable=False),
        T.StructField("measurement_publisher", T.StringType(), nullable=False),
        T.StructField("measurement_of", T.StringType(), nullable=False),
        T.StructField("measurement_number", T.DoubleType(), nullable=True),
        T.StructField("measurement_string", T.StringType(), nullable=True),
        T.StructField("measurement_bool", T.BooleanType(), nullable=True),
        T.StructField("measurement_location", T.StringType(), nullable=True),
        T.StructField("correlation_id", T.StringType(), nullable=True),
        T.StructField("measurement_unique_id", T.LongType(), nullable=True),
    ]
)

CONDITIONS_COLUMNS = [f.name for f in CONDITIONS_SCHEMA.fields]

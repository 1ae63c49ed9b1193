"""Test-data adapters: the driver's synthetic tables → engine inputs.

``/root/testdata/sf*/`` ships a TPC-H-ish star schema plus an
``events`` stream table (event_id, ts, user_id, event_type, value,
props-JSON). The engine's canonical store is the EAV ``conditions``
shape (SURVEY §1.1), so ``events_as_conditions`` unpivots each event
into atomic measurements:

    (ts, subject='user_<id>', publisher='events', of='value',     number)
    (ts, subject='user_<id>', publisher='events', of='event_type', string)
    (ts, subject='user_<id>', publisher='events', of='props_k',   number)

— exactly the reference's recursive fan-out applied to the event dict
(timeseries.py:43-98), with ``props_k`` exercising the JSON-leaf path
(``get_json_object``). ``measurement_unique_id`` is a deterministic
``event_id*4 + slot`` so window tie-breaks are reproducible in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; nanosecond timestamp columns (written by
    pandas, no Spark equivalent) arrive as long (see session config
    ``nanosAsLong``) and are truncated to microseconds — exactly what
    DuckDB does reading the same files, so oracles agree."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        meta = field.metadata or {}
        if meta.get("__nanos_as_long", False) or (
            name == "events" and field.name == "ts"
        ):
            # integer `div` — float division would lose precision above
            # 2^53 ns and nanos since epoch is ~1.7e18
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
            )
    return df


def events_as_conditions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → wide ``conditions`` rows (deterministic EAV unpivot).

    Single-scan: each event row explodes into its 3 measurements via
    ``explode(array(struct...))`` rather than a 3-way self-union —
    one parquet scan instead of three, which matters when the base
    table is 100 TB, and the explode stays inside whole-stage codegen.
    """
    ev = load_table(spark, sf_dir, "events")
    subject = F.concat(F.lit("user_"), F.col("user_id").cast("string"))

    def rec(of: str, slot: int, num, s):
        return F.struct(
            F.lit(of).alias("measurement_of"),
            F.lit(slot).alias("slot"),
            (num if num is not None else F.lit(None).cast("double")).alias(
                "measurement_number"
            ),
            (s if s is not None else F.lit(None).cast("string")).alias(
                "measurement_string"
            ),
        )

    recs = F.array(
        rec("value", 0, F.col("value"), None),
        rec("event_type", 1, None, F.col("event_type")),
        rec(
            "props_k",
            2,
            F.get_json_object(F.col("props"), "$.k").cast("double"),
            None,
        ),
    )
    return ev.select(
        F.col("ts").alias("timestamp"),
        subject.alias("measurement_subject"),
        F.lit("events").alias("measurement_publisher"),
        F.col("event_id").cast("string").alias("correlation_id"),
        F.col("event_id"),
        F.explode(recs).alias("r"),
    ).select(
        "timestamp",
        "measurement_subject",
        "measurement_publisher",
        F.col("r.measurement_of").alias("measurement_of"),
        F.col("r.measurement_number").alias("measurement_number"),
        F.col("r.measurement_string").alias("measurement_string"),
        F.lit(None).cast("boolean").alias("measurement_bool"),
        F.lit(None).cast("string").alias("measurement_location"),
        "correlation_id",
        (F.col("event_id") * 4 + F.col("r.slot")).alias("measurement_unique_id"),
    )


# SQL fragment mirrored by the DuckDB oracle for events_as_conditions —
# kept adjacent to the Spark code so the two definitions evolve together.
EVENTS_AS_CONDITIONS_ORACLE = """
SELECT ts AS timestamp,
       'user_' || CAST(user_id AS VARCHAR) AS measurement_subject,
       'events' AS measurement_publisher,
       'value' AS measurement_of,
       value AS measurement_number,
       CAST(NULL AS VARCHAR) AS measurement_string,
       CAST(NULL AS BOOLEAN) AS measurement_bool,
       CAST(NULL AS VARCHAR) AS measurement_location,
       CAST(event_id AS VARCHAR) AS correlation_id,
       event_id * 4 + 0 AS measurement_unique_id
FROM events
UNION ALL
SELECT ts, 'user_' || CAST(user_id AS VARCHAR), 'events', 'event_type',
       NULL, event_type, NULL, NULL,
       CAST(event_id AS VARCHAR), event_id * 4 + 1
FROM events
UNION ALL
SELECT ts, 'user_' || CAST(user_id AS VARCHAR), 'events', 'props_k',
       CAST(json_extract_string(props, '$.k') AS DOUBLE), NULL, NULL, NULL,
       CAST(event_id AS VARCHAR), event_id * 4 + 2
FROM events
"""

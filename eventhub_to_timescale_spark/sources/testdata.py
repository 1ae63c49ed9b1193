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
from pyspark.sql.types import LongType, TimestampNTZType


def ensure_session_confs(spark: SparkSession) -> None:
    """Set the dynamic SQLConfs the engine's semantics depend on.

    The driver (and any host application) may hand us a SparkSession
    built without ``eventhub_to_timescale_spark.session.get_spark`` —
    these three are runtime-settable and REQUIRED: nanos parquet reads
    (test tables), UTC timestamp semantics, and try-cast-shaped EAV
    coercion (ANSI off)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # read timezone-less parquet timestamps as TIMESTAMP, not NTZ —
    # avoids a cast projection that would block time-range pushdown
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; nanosecond timestamp columns (written by
    pandas, no Spark equivalent) arrive as long (see session config
    ``nanosAsLong``) and are truncated to microseconds — exactly what
    DuckDB does reading the same files, so oracles agree."""
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        meta = field.metadata or {}
        # The conversion only applies when the column physically arrived
        # as a long (nanos written by pandas + nanosAsLong read). Data
        # regenerated with a native timestamp type must pass through
        # untouched — applying `div` to a timestamp is a plan-time error.
        # Parquet written without timezone annotation arrives as
        # TIMESTAMP_NTZ, which `unix_micros`/window functions reject.
        # With the session timezone pinned UTC the cast is
        # value-preserving and matches DuckDB's naive-timestamp read.
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
            continue
        if not isinstance(field.dataType, LongType):
            continue
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

    Shape choice, measured via ``.explain``: a 3-way
    union-of-projections, NOT a single-scan ``explode``. With union,
    a downstream ``measurement_of = 'x'`` filter constant-folds the
    other branches to empty (PruneFilters kills their scans entirely)
    and each surviving branch's parquet scan is column-pruned to just
    the columns that measurement needs. The explode form forces every
    query — however narrow — to read all five source columns and emit
    3× rows before filtering; at 100 TB that is the difference between
    scanning one column slice and scanning the table.
    """
    ev = load_table(spark, sf_dir, "events")
    subject = F.concat(F.lit("user_"), F.col("user_id").cast("string"))
    cid = F.col("event_id").cast("string")

    def base(of: str, slot: int):
        return [
            F.col("ts").alias("timestamp"),
            subject.alias("measurement_subject"),
            F.lit("events").alias("measurement_publisher"),
            F.lit(of).alias("measurement_of"),
            cid.alias("correlation_id"),
            (F.col("event_id") * 4 + slot).alias("measurement_unique_id"),
        ]

    def nulls(*names):
        return [F.lit(None).cast(t).alias(n) for n, t in names]

    value_rows = ev.select(
        *base("value", 0),
        F.col("value").alias("measurement_number"),
        *nulls(
            ("measurement_string", "string"),
            ("measurement_bool", "boolean"),
            ("measurement_location", "string"),
        ),
    )
    type_rows = ev.select(
        *base("event_type", 1),
        *nulls(("measurement_number", "double")),
        F.col("event_type").alias("measurement_string"),
        *nulls(
            ("measurement_bool", "boolean"),
            ("measurement_location", "string"),
        ),
    )
    props_rows = ev.select(
        *base("props_k", 2),
        F.get_json_object(F.col("props"), "$.k").cast("double").alias(
            "measurement_number"
        ),
        *nulls(
            ("measurement_string", "string"),
            ("measurement_bool", "boolean"),
            ("measurement_location", "string"),
        ),
    )
    cols = [
        "timestamp",
        "measurement_subject",
        "measurement_publisher",
        "measurement_of",
        "measurement_number",
        "measurement_string",
        "measurement_bool",
        "measurement_location",
        "correlation_id",
        "measurement_unique_id",
    ]
    return (
        value_rows.select(*cols)
        .unionByName(type_rows.select(*cols))
        .unionByName(props_rows.select(*cols))
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

"""Deterministic envelope synthesis: ``events`` rows → raw publisher
messages, used to exercise the REAL ingest path (envelope ``from_json``
→ routing → converter → sink pivot) under the driver's DuckDB oracle.

Each builder renders events into the exact wire format a publisher
produces (MQTT envelope with a double-encoded JSON payload — reference
test_utils/test_data.json shape), entirely with JVM-side expressions.
The paired ``*_ORACLE`` SQL computes the expected *conditions* rows
directly from the events columns — independent of the JSON round-trip,
so the oracle genuinely cross-checks parsing, routing, fan-out, typing
and the wide pivot.

Cross-engine comparability rules used throughout:
- compared numbers stay DOUBLE end-to-end (never double→string across
  engines; Spark-internal string hops round-trip losslessly),
- synthesized lat/lon use exact-in-binary .5 fractions so WKT string
  rendering agrees between JVM and DuckDB,
- timestamps stay microsecond-UTC on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ISO = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def _iso(col):
    return F.date_format(col, _ISO)


def _parallel(events: DataFrame) -> DataFrame:
    """The test parquet is a single file → one input partition; fan the
    JSON-rendering work across all cores (the shuffle of the narrow
    events rows is far cheaper than serializing single-threaded)."""
    cores = events.sparkSession.sparkContext.defaultParallelism
    return events.repartition(cores)


# ---------------------------------------------------------------------------
# Glow: nested payload, declared-struct path, per-subject fan-out
# ---------------------------------------------------------------------------


def events_to_glow_envelopes(events: DataFrame) -> DataFrame:
    """→ one raw envelope JSON string per event (column ``value``).

    even event_id → electricitymeter (energy.import.* + power.*),
    odd  event_id → gasmeter        (energy.import.* only).
    """
    events = _parallel(events)
    subject = F.when(F.col("event_id") % 2 == 0, F.lit("electricitymeter")).otherwise(
        F.lit("gasmeter")
    )
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    imp = F.struct(
        F.col("value").alias("cumulative"),
        k.alias("day"),
        F.struct(
            F.lit(0.07).alias("unitrate"), F.lit(0.29).alias("standingcharge")
        ).alias("price"),
        F.lit("kWh").alias("units"),  # ignored key — must NOT become a record
    )
    meter = lambda with_power: F.struct(  # noqa: E731
        _iso(F.col("ts")).alias("timestamp"),
        F.struct(imp.alias("import")).alias("energy"),
        *(
            [F.struct(F.col("value").alias("value"), F.lit("W").alias("units")).alias("power")]
            if with_power
            else []
        ),
    )
    payload = F.when(
        F.col("event_id") % 2 == 0,
        F.to_json(F.struct(meter(True).alias("electricitymeter"))),
    ).otherwise(F.to_json(F.struct(meter(False).alias("gasmeter"))))
    raw = F.to_json(
        F.struct(
            F.concat(F.lit("glow/"), subject).alias("topic"),
            payload.alias("payload"),
            F.lit(0).alias("qos"),
            F.lit(0).alias("retain"),
            _iso(F.col("ts")).alias("timestamp"),
        )
    )
    return events.select(raw.alias("value"))


GLOW_ORACLE = """
WITH base AS (
  SELECT ts,
         CASE WHEN event_id % 2 = 0 THEN 'electricitymeter' ELSE 'gasmeter' END AS subj,
         event_id, value,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
  FROM events
), recs AS (
  SELECT ts, subj, 'import_cumulative' AS m_of, value AS num FROM base
  UNION ALL
  SELECT ts, subj, 'import_day', k FROM base
  UNION ALL
  SELECT ts, subj, 'import_unitrate', 0.07::DOUBLE FROM base
  UNION ALL
  SELECT ts, subj, 'import_standingcharge', 0.29::DOUBLE FROM base
  UNION ALL
  SELECT ts, subj, 'power_value', value FROM base WHERE subj = 'electricitymeter'
)
SELECT ts AS timestamp,
       subj AS measurement_subject,
       'glow' AS measurement_publisher,
       m_of AS measurement_of,
       num AS measurement_number
FROM recs
"""


# ---------------------------------------------------------------------------
# Homie: one record per message, type by measurement name
# ---------------------------------------------------------------------------

_HOMIE_OF = {
    "click": "measure-temperature",
    "view": "heating-setpoint",
    "purchase": "thermostat-setpoint",
    "signup": "mode",
    "error": "state",
}


def events_to_homie_envelopes(events: DataFrame) -> DataFrame:
    events = _parallel(events)
    m_of = F.element_at(
        F.create_map(*[F.lit(x) for kv in _HOMIE_OF.items() for x in kv]),
        F.col("event_type"),
    )
    is_string = m_of.isin("state", "mode")
    payload = F.when(is_string, F.col("event_type")).otherwise(
        F.col("value").cast("string")
    )
    topic = F.concat(
        F.lit("homie/device"),
        (F.col("user_id") % 4).cast("string"),
        F.lit("/"),
        m_of,
    )
    raw = F.to_json(
        F.struct(
            topic.alias("topic"),
            payload.alias("payload"),
            F.lit(1).alias("qos"),
            F.lit(0).alias("retain"),
            _iso(F.col("ts")).alias("timestamp"),
        )
    )
    return events.select(raw.alias("value"))


HOMIE_ORACLE = """
WITH m AS (
  SELECT ts, user_id, event_type, value,
         CASE event_type
           WHEN 'click' THEN 'measure-temperature'
           WHEN 'view' THEN 'heating-setpoint'
           WHEN 'purchase' THEN 'thermostat-setpoint'
           WHEN 'signup' THEN 'mode'
           WHEN 'error' THEN 'state'
         END AS m_of
  FROM events
)
SELECT ts AS timestamp,
       'device' || CAST(user_id % 4 AS VARCHAR) AS measurement_subject,
       'homie' AS measurement_publisher,
       m_of AS measurement_of,
       CASE WHEN m_of IN ('state','mode') THEN NULL ELSE value END AS measurement_number,
       CASE WHEN m_of IN ('state','mode') THEN event_type END AS measurement_string
FROM m
"""


# ---------------------------------------------------------------------------
# Emon: flat dynamic payload (map path), epoch timestamp inside payload
# ---------------------------------------------------------------------------


def events_to_emon_envelopes(events: DataFrame) -> DataFrame:
    events = _parallel(events)
    epoch_s = F.floor(F.unix_micros(F.col("ts")) / F.lit(1_000_000)).cast("long")
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    payload = F.to_json(
        F.struct(
            epoch_s.cast("string").alias("time"),
            F.col("value").cast("string").alias("P1"),
            k.cast("string").alias("vrms"),
            F.col("event_type").alias("label"),
        )
    )
    raw = F.to_json(
        F.struct(
            F.lit("emon/emonTx4").alias("topic"),
            payload.alias("payload"),
            F.lit(0).alias("qos"),
            F.lit(0).alias("retain"),
            _iso(F.col("ts")).alias("timestamp"),
        )
    )
    return events.select(raw.alias("value"))


EMON_ORACLE = """
WITH base AS (
  SELECT make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000) AS rts,
         value,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k,
         event_type
  FROM events
), recs AS (
  SELECT rts, 'P1' AS m_of, value AS num, CAST(NULL AS VARCHAR) AS str FROM base
  UNION ALL
  SELECT rts, 'vrms', k, NULL FROM base
  UNION ALL
  SELECT rts, 'label', NULL, event_type FROM base
)
SELECT rts AS timestamp,
       'emonTx4' AS measurement_subject,
       'emon' AS measurement_publisher,
       m_of AS measurement_of,
       num AS measurement_number,
       str AS measurement_string
FROM recs
"""


# ---------------------------------------------------------------------------
# BMW: nested vehicle state + keyed dedup on (vin, lastUpdatedAt)
# ---------------------------------------------------------------------------


def events_to_bmw_messages(events: DataFrame) -> DataFrame:
    """→ one raw BMW snapshot JSON per surviving event.

    lastUpdatedAt is the event's hour — several events per (vin, hour)
    make real duplicate keys. The converter's ``dropDuplicates`` keeps
    an arbitrary survivor, so to stay oracle-deterministic the
    duplicate groups here are pre-reduced to min(event_id); the
    converter's dedup still runs (as a no-op) and the
    nondeterministic-survivor semantics are covered by unit tests.
    """
    vin = F.concat(F.lit("VIN"), (F.col("user_id") % 5).cast("string"))
    last_upd = _iso(F.date_trunc("hour", F.col("ts")))
    lat = ((F.col("user_id") % 180) - F.lit(89.5)).cast("double")
    lon = (((F.col("user_id") * 3) % 360) - F.lit(179.5)).cast("double")
    deduped = (
        events.withColumn("vin", vin)
        .withColumn("last_upd", last_upd)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vin", "last_upd").orderBy("event_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    state = F.struct(
        F.col("last_upd").alias("lastUpdatedAt"),
        (F.col("event_id") + 100000).alias("currentMileage"),
        F.struct(
            (F.col("event_id") % 101).cast("double").alias("chargingLevelPercent"),
            (F.col("event_id") % 400).cast("double").alias("range"),
            (F.col("event_id") % 2 == 0).alias("isChargerConnected"),
            F.col("event_type").alias("chargingStatus"),
        ).alias("electricChargingState"),
        F.struct(
            F.struct(lat.alias("latitude"), lon.alias("longitude")).alias(
                "coordinates"
            )
        ).alias("location"),
    )
    raw = F.to_json(F.struct(F.col("vin").alias("vin"), state.alias("state")))
    return deduped.select(raw.alias("value"))


BMW_ORACLE = """
WITH base AS (
  SELECT *,
         'VIN' || CAST(user_id % 5 AS VARCHAR) AS vin,
         date_trunc('hour', ts) AS last_upd,
         ((user_id % 180) - 89.5)::DOUBLE AS lat,
         (((user_id * 3) % 360) - 179.5)::DOUBLE AS lon
  FROM events
  QUALIFY row_number() OVER (PARTITION BY vin, last_upd ORDER BY event_id) = 1
), recs AS (
  SELECT last_upd, vin, 'chargingLevelPercent' AS m_of,
         (event_id % 101)::DOUBLE AS num, CAST(NULL AS VARCHAR) AS str,
         CAST(NULL AS BOOLEAN) AS b, CAST(NULL AS VARCHAR) AS loc FROM base
  UNION ALL
  SELECT last_upd, vin, 'range', (event_id % 400)::DOUBLE, NULL, NULL, NULL FROM base
  UNION ALL
  SELECT last_upd, vin, 'isChargerConnected', NULL, NULL, event_id % 2 = 0, NULL FROM base
  UNION ALL
  SELECT last_upd, vin, 'chargingStatus', NULL, event_type, NULL, NULL FROM base
  UNION ALL
  SELECT last_upd, vin, 'currentMileage', (event_id + 100000)::DOUBLE, NULL, NULL, NULL FROM base
  UNION ALL
  SELECT last_upd, vin, 'coordinates', NULL, NULL, NULL,
         'SRID=4326;POINT(' || CAST(lon AS VARCHAR) || ' ' || CAST(lat AS VARCHAR) || ')'
  FROM base
)
SELECT last_upd AS timestamp,
       vin AS measurement_subject,
       'bmw' AS measurement_publisher,
       m_of AS measurement_of,
       num AS measurement_number,
       str AS measurement_string,
       b AS measurement_bool,
       loc AS measurement_location,
       strftime(last_upd, '%Y-%m-%dT%H:%M:%S.%fZ') AS correlation_id
FROM recs
"""

# ---------------------------------------------------------------------------
# Dynamic: depth-3 nested payload for the schema-less flatten path
# ---------------------------------------------------------------------------


def events_to_dynamic_envelopes(events: DataFrame) -> DataFrame:
    """→ envelopes for an UNDECLARED publisher ``dyn`` whose payload
    nests three levels deep and embeds a JSON-encoded-string subtree
    (``packed``) — exercising ``recursively_deserialize`` +
    ``create_record_recursive`` semantics end-to-end:

    - ``meta``                 depth-1 string leaf
    - ``outer.reading``        depth-2 number leaf
    - ``outer.flags.active``   depth-3 boolean leaf
    - ``outer.flags.mode``     depth-3 string leaf
    - ``outer.ignoreme.x``     pruned by ignore_keys
    - ``packed`` → ``inner.q`` depth-3 number leaf reached THROUGH a
      JSON-encoded string value
    """
    events = _parallel(events)
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    packed = F.to_json(F.struct(F.struct(k.alias("q")).alias("inner")))
    payload = F.to_json(
        F.struct(
            F.col("event_type").alias("meta"),
            F.struct(
                F.col("value").alias("reading"),
                F.struct(
                    (F.col("event_id") % 2 == 0).alias("active"),
                    F.col("event_type").alias("mode"),
                ).alias("flags"),
                F.struct(F.lit(1).alias("x")).alias("ignoreme"),
            ).alias("outer"),
            packed.alias("packed"),
        )
    )
    raw = F.to_json(
        F.struct(
            F.lit("dyn/nested").alias("topic"),
            payload.alias("payload"),
            F.lit(0).alias("qos"),
            F.lit(0).alias("retain"),
            _iso(F.col("ts")).alias("timestamp"),
        )
    )
    return events.select(raw.alias("value"))


DYNAMIC_ORACLE = """
WITH base AS (
  SELECT ts, event_id, value, event_type,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
  FROM events
), recs AS (
  SELECT ts, 'meta' AS m_of, CAST(NULL AS DOUBLE) AS num,
         event_type AS str, CAST(NULL AS BOOLEAN) AS b FROM base
  UNION ALL
  SELECT ts, 'reading', value, NULL, NULL FROM base
  UNION ALL
  SELECT ts, 'active', NULL, NULL, event_id % 2 = 0 FROM base
  UNION ALL
  SELECT ts, 'mode', NULL, event_type, NULL FROM base
  UNION ALL
  SELECT ts, 'q', k, NULL, NULL FROM base
)
SELECT ts AS timestamp,
       'nested' AS measurement_subject,
       'dyn' AS measurement_publisher,
       m_of AS measurement_of,
       num AS measurement_number,
       str AS measurement_string,
       b AS measurement_bool
FROM recs
"""


# ---------------------------------------------------------------------------
# Normalized-record wire messages (S3/S5 format) with schema violations
# ---------------------------------------------------------------------------


def events_to_record_messages(events: DataFrame) -> DataFrame:
    """→ v2 single-record wire messages (the S5 sink's format, fed
    back through the S3 source). Every 10th event smuggles an
    undeclared ``smuggled`` field — an ``additionalProperties: false``
    violation the strict validator must reject (``to_json`` omits the
    null field on conforming rows, so only violators carry it)."""
    from eventhub_to_timescale_spark.ingest.envelope import materialize

    events = _parallel(events)
    rec = F.struct(
        _iso(F.col("ts")).alias("timestamp"),
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias(
            "measurement_subject"
        ),
        F.lit("events").alias("measurement_publisher"),
        F.lit("value").alias("measurement_of"),
        F.col("value").cast("string").alias("measurement_value"),
        F.lit("number").alias("measurement_data_type"),
        F.col("event_id").cast("string").alias("correlation_id"),
        F.when(F.col("event_id") % 10 == 0, F.lit(1)).alias("smuggled"),
    )
    # materialize (Generate barrier), not a bare select: the strict
    # validator filters on json_object_keys(raw) — a predicate over
    # THIS rendered string.  As a plain projection Catalyst inlined
    # the whole StructsToJson render into that predicate and pushed
    # it below the fan-out repartition, re-rendering every row's JSON
    # twice in the single-input-partition pre-shuffle stage (r15
    # profile: 1.2-1.6 s single-task job per warm count).  The
    # barrier pins one render per row, after the exchange.
    return materialize(events, F.to_json(rec), "value").select("value")


RECORDS_STRICT_ORACLE = """
SELECT ts AS timestamp,
       'user_' || CAST(user_id AS VARCHAR) AS measurement_subject,
       value AS measurement_number,
       CAST(event_id AS VARCHAR) AS correlation_id
FROM events
WHERE event_id % 10 <> 0
"""

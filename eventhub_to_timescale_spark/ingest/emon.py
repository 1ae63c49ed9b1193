"""emonTx4 energy-monitor converter (reference emon.py:14-48).

Semantics reproduced:
- publisher must be ``emon``; subject = last topic segment, kept only
  for ``emonTx4``.
- payload is double-encoded *flat* JSON; record timestamp comes from
  its required ``time`` key (epoch seconds — emon.py extract_timestamp;
  missing/invalid → row dropped, the reference raises ValueError).
- every remaining key becomes one record, no prefix, ``time`` ignored.

This converter exercises the engine's **dynamic-payload path**: the
payload keys are discovered at runtime (``json_object_keys``) and each
leaf's *exact* JSON text extracted via ``parse_json``/``variant_get``
(Spark 4 VariantType — a plain ``map<string,string>`` parse would
re-render numbers in scientific notation and corrupt epoch
timestamps), then exploded with per-leaf type inference
(``infer_type_tag``). This is the Spark-first equivalent of the
reference's recursive flatten over unknown keys (timeseries.py:43-98)
for flat payloads. Glow takes the declared-struct path; together they
cover both SURVEY §1.3 strategies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.functions.scalars import (
    parse_timestamp_any,
    topic_subject,
)
from eventhub_to_timescale_spark.functions.typeinfer import infer_type_tag
from eventhub_to_timescale_spark.ingest.envelope import publisher_is

EMON_SUBJECTS = ("emonTx4",)


def emon_to_records(envelope_df: DataFrame) -> DataFrame:
    df = (
        publisher_is(envelope_df, "emon")
        .filter(F.col("payload").isNotNull())
        .withColumn("measurement_subject", topic_subject(F.col("topic")))
        .filter(F.col("measurement_subject").isin(*EMON_SUBJECTS))
        .withColumn(
            "kv",
            F.map_from_entries(
                F.expr(
                    "transform(json_object_keys(payload), k -> "
                    "struct(k, cast(variant_get(parse_json(payload), "
                    "'$[\"' || k || '\"]', 'string') as string)))"
                )
            ),
        )
        .withColumn("rec_ts", parse_timestamp_any(F.col("kv")["time"]))
        .filter(F.col("rec_ts").isNotNull())
    )
    out = (
        df.select(
            F.col("rec_ts").alias("timestamp"),
            "measurement_subject",
            F.lower(F.col("publisher")).alias("measurement_publisher"),
            "correlation_id",
            F.explode(F.map_entries(F.col("kv"))).alias("e"),
        )
        .filter(F.col("e.key") != "time")
        .select(
            "timestamp",
            "measurement_subject",
            "measurement_publisher",
            F.col("e.key").alias("measurement_of"),
            F.col("e.value").alias("measurement_value"),
            infer_type_tag(F.col("e.value")).alias("measurement_data_type"),
            "correlation_id",
        )
    )
    return out.filter(F.col("measurement_value").isNotNull())

"""Glow/Hildebrand smart-meter converter (reference glow.py:70-91).

Semantics reproduced:
- publisher must be ``glow`` (case-insensitive) — as a filter.
- subject = last topic segment, kept only for
  ``electricitymeter``/``gasmeter`` (glow.py allowlist).
- payload is double-encoded JSON → second ``from_json`` with a
  *declared* struct (SURVEY §1.3: per-publisher declared payload
  structs replace the reference's fully-dynamic recursive flatten —
  Glow payload shapes are stable).
- record timestamp comes from ``payload[subject].timestamp``
  (glow.py:17), NOT the envelope.
- fan-out: ``energy.import.*`` flattened with prefix ``import`` (the
  nested ``price`` dict recurses to the same prefix level —
  timeseries.py:88-92), plus ``power.*`` with prefix ``power`` for
  electricitymeter only (glow.py:44-55).
- ignore keys (glow.py get_ignore_keys): units, mpan, mprn, supplier,
  dayweekmonthvolunits, cumulativevolunits — expressed by simply not
  selecting those columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eventhub_to_timescale_spark.functions.scalars import (
    parse_timestamp_any,
    topic_subject,
)
from eventhub_to_timescale_spark.ingest.envelope import (
    materialize,
    publisher_is,
    unpivot_fields,
)
from eventhub_to_timescale_spark.schema import TYPE_NUMBER

GLOW_SUBJECTS = ("electricitymeter", "gasmeter")

# One uniform meter struct for both subjects (gasmeter simply has no
# power data → nulls). Ignored keys are not declared at all.
_METER_STRUCT = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),
        T.StructField(
            "energy",
            T.StructType(
                [
                    T.StructField(
                        "import",
                        T.StructType(
                            [
                                T.StructField("cumulative", T.DoubleType()),
                                T.StructField("day", T.DoubleType()),
                                T.StructField("week", T.DoubleType()),
                                T.StructField("month", T.DoubleType()),
                                # gas meters also publish volume leaves
                                # — NOT ignore-keys, they fan out
                                # (reference golden glow_gasmeter: 10
                                # records incl. import_*vol)
                                T.StructField("cumulativevol", T.DoubleType()),
                                T.StructField("dayvol", T.DoubleType()),
                                T.StructField("weekvol", T.DoubleType()),
                                T.StructField("monthvol", T.DoubleType()),
                                T.StructField(
                                    "price",
                                    T.StructType(
                                        [
                                            T.StructField("unitrate", T.DoubleType()),
                                            T.StructField(
                                                "standingcharge", T.DoubleType()
                                            ),
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "power",
            T.StructType([T.StructField("value", T.DoubleType())]),
        ),
    ]
)

GLOW_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("electricitymeter", _METER_STRUCT),
        T.StructField("gasmeter", _METER_STRUCT),
    ]
)


def glow_fields(meter, subject):
    """The glow fan-out as (measurement_of, value, type_tag) tuples over
    a ``meter`` struct column — shared by ``glow_to_records`` and the
    single-pass router so the leaf list can't diverge."""
    imp = meter["energy"]["import"]
    return [
        ("import_cumulative", imp["cumulative"], TYPE_NUMBER),
        ("import_day", imp["day"], TYPE_NUMBER),
        ("import_week", imp["week"], TYPE_NUMBER),
        ("import_month", imp["month"], TYPE_NUMBER),
        ("import_cumulativevol", imp["cumulativevol"], TYPE_NUMBER),
        ("import_dayvol", imp["dayvol"], TYPE_NUMBER),
        ("import_weekvol", imp["weekvol"], TYPE_NUMBER),
        ("import_monthvol", imp["monthvol"], TYPE_NUMBER),
        ("import_unitrate", imp["price"]["unitrate"], TYPE_NUMBER),
        ("import_standingcharge", imp["price"]["standingcharge"], TYPE_NUMBER),
        # power_* applies to electricitymeter only (glow.py:44-55)
        (
            "power_value",
            F.when(subject == "electricitymeter", meter["power"]["value"]),
            TYPE_NUMBER,
        ),
    ]


def glow_to_records(envelope_df: DataFrame) -> DataFrame:
    """Envelope rows → canonical atomic records for the glow publisher."""
    subject = topic_subject(F.col("topic"))
    base = (
        publisher_is(envelope_df, "glow")
        .filter(F.col("payload").isNotNull())
        .withColumn("measurement_subject", subject)
        .filter(F.col("measurement_subject").isin(*GLOW_SUBJECTS))
    )
    # materialize the payload parse (once per row — see
    # envelope.materialize), then pick the struct matching the topic
    # subject; a payload lacking its subject key yields nulls → rows
    # dropped by the timestamp filter (reference returns [] there,
    # glow.py:30-31)
    df = (
        materialize(base, F.from_json(F.col("payload"), GLOW_PAYLOAD_SCHEMA), "p")
        .withColumn(
            "meter",
            F.when(
                F.col("measurement_subject") == "electricitymeter",
                F.col("p.electricitymeter"),
            ).otherwise(F.col("p.gasmeter")),
        )
        .withColumn("rec_ts", parse_timestamp_any(F.col("meter.timestamp")))
    )

    fields = glow_fields(F.col("meter"), F.col("measurement_subject"))
    return unpivot_fields(
        df,
        fields,
        timestamp=F.col("rec_ts"),
        subject=F.col("measurement_subject"),
        publisher=F.lower(F.col("publisher")),
    )

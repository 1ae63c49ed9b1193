"""BMW ConnectedDrive vehicle-state converter (reference
bmw_to_timescale.py:8-50, 70-133).

Semantics reproduced:
- input is one JSON document per vehicle snapshot: ``{vin, state:{...}}``.
- **dedup** on (vin, state.lastUpdatedAt) — the reference keeps a
  processed-id table per VIN in Azure Table Storage
  (duplicate_check.py); batch path here is ``dropDuplicates`` (the
  streaming path with watermarked state is in ``streaming/``).
- six fields projected, each to one atomic record with
  correlation_id = lastUpdatedAt (bmw_to_timescale.py:97-129):
    chargingLevelPercent NUMBER, range NUMBER,
    isChargerConnected BOOLEAN (bool()-coerced), chargingStatus STRING,
    currentMileage NUMBER (must be integral; reference raises on
    non-int → we null it out), coordinates GEOGRAPHY
    (state.location.coordinates.{latitude,longitude}, validated
    lat∈[-90,90] lon∈[-180,180], value rendered ``[lat, lon]``).
- absent fields are skipped, not errored (bmw_to_timescale.py:167-190).

Documented divergence — string isChargerConnected: the reference's
``bool()`` coercion makes ANY non-empty string truthy, so
``bool('false')`` and ``bool('no')`` are True (an upstream foot-gun,
not a semantic). ``parse_bool`` here maps 'false'/'no'→False,
'true'/'yes'→True and routes unparseable strings to the reject
channel. Boolean and int(0/1) payloads — the shapes the reference
goldens actually contain — coerce identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eventhub_to_timescale_spark.functions.scalars import (
    parse_bool,
    parse_timestamp_any,
)
from eventhub_to_timescale_spark.ingest.envelope import unpivot_fields
from eventhub_to_timescale_spark.schema import (
    TYPE_BOOLEAN,
    TYPE_GEOGRAPHY,
    TYPE_NUMBER,
    TYPE_STRING,
)

BMW_STATE_SCHEMA = T.StructType(
    [
        T.StructField("vin", T.StringType()),
        T.StructField(
            "state",
            T.StructType(
                [
                    T.StructField("lastUpdatedAt", T.StringType()),
                    T.StructField("currentMileage", T.DoubleType()),
                    T.StructField(
                        "electricChargingState",
                        T.StructType(
                            [
                                T.StructField("chargingLevelPercent", T.DoubleType()),
                                T.StructField("range", T.DoubleType()),
                                T.StructField("isChargerConnected", T.StringType()),
                                T.StructField("chargingStatus", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "location",
                        T.StructType(
                            [
                                T.StructField(
                                    "coordinates",
                                    T.StructType(
                                        [
                                            T.StructField("latitude", T.DoubleType()),
                                            T.StructField("longitude", T.DoubleType()),
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def bmw_to_records(raw_df: DataFrame, raw_col: str = "value") -> DataFrame:
    """Raw BMW snapshot JSON strings → canonical atomic records,
    deduplicated on (vin, lastUpdatedAt)."""
    from eventhub_to_timescale_spark.ingest.envelope import materialize

    df = (
        materialize(
            raw_df, F.from_json(F.col(raw_col).cast("string"), BMW_STATE_SCHEMA), "m"
        )
        .filter(F.col("m.vin").isNotNull() & F.col("m.state.lastUpdatedAt").isNotNull())
        .select(
            F.col("m.vin").alias("vin"),
            F.col("m.state.lastUpdatedAt").alias("last_updated_at"),
            F.col("m.state.currentMileage").alias("mileage"),
            F.col("m.state.electricChargingState").alias("charging"),
            F.col("m.state.location.coordinates").alias("coords"),
        )
        # reference: check_duplicate on (vin, lastUpdatedAt) via Table
        # Storage point-get (duplicate_check.py:73-96) ≙ keyed dedup
        .dropDuplicates(["vin", "last_updated_at"])
        .withColumn("rec_ts", parse_timestamp_any(F.col("last_updated_at")))
    )

    # bool() coercion semantics (reference bmw_to_timescale.py:107):
    # real booleans / "true"/"false" strings, AND numerics — the BMW
    # API sends 0/1 ints (golden bmw_topic_messages.json) — nonzero →
    # true
    charger_raw = F.col("charging.isChargerConnected")
    charger_bool = F.coalesce(
        parse_bool(charger_raw),
        F.when(charger_raw.try_cast("double").isNotNull(), charger_raw.try_cast("double") != 0),
    )

    lat, lon = F.col("coords.latitude"), F.col("coords.longitude")
    coords_ok = lat.isNotNull() & lon.isNotNull() & lat.between(-90, 90) & lon.between(
        -180, 180
    )
    # mileage must be integral (reference raises TypeError for non-int,
    # bmw_to_timescale.py:283) — non-integral → null → record skipped
    mileage_ok = F.col("mileage").isNotNull() & (
        F.col("mileage") == F.floor(F.col("mileage"))
    )
    fields = [
        ("chargingLevelPercent", F.col("charging.chargingLevelPercent"), TYPE_NUMBER),
        ("range", F.col("charging.range"), TYPE_NUMBER),
        ("isChargerConnected", charger_bool, TYPE_BOOLEAN),
        ("chargingStatus", F.col("charging.chargingStatus"), TYPE_STRING),
        (
            "currentMileage",
            F.when(mileage_ok, F.col("mileage").cast("long")),
            TYPE_NUMBER,
        ),
        (
            "coordinates",
            F.when(coords_ok, F.concat(F.lit("["), lat, F.lit(", "), lon, F.lit("]"))),
            TYPE_GEOGRAPHY,
        ),
    ]
    return unpivot_fields(
        df,
        fields,
        timestamp=F.col("rec_ts"),
        subject=F.col("vin"),
        publisher=F.lit("bmw"),
        correlation_id=F.col("last_updated_at"),
    )

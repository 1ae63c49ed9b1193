"""BMW converter golden tests (reference test_bmw_to_timescale.py
coverage model: per-extractor cases + dedup behavior)."""

from __future__ import annotations

import json
from datetime import datetime

BASE_STATE = {
    "vin": "WBA0000000000TEST",
    "state": {
        "lastUpdatedAt": "2024-02-01T12:00:00Z",
        "currentMileage": 31546,
        "electricChargingState": {
            "chargingLevelPercent": 70,
            "range": 206,
            "isChargerConnected": False,
            "chargingStatus": "NOT_CHARGING",
        },
        "location": {
            "coordinates": {"latitude": 51.5, "longitude": -0.125},
            "address": {"formatted": "somewhere"},
            "heading": 90,
        },
    },
}


def _bmw(spark, messages):
    from eventhub_to_timescale_spark.ingest.bmw import bmw_to_records

    df = spark.createDataFrame([(json.dumps(m),) for m in messages], "value string")
    return bmw_to_records(df)


def test_bmw_all_six_fields(spark):
    recs = {
        r.measurement_of: r for r in _bmw(spark, [BASE_STATE]).collect()
    }
    assert set(recs) == {
        "chargingLevelPercent",
        "range",
        "isChargerConnected",
        "chargingStatus",
        "currentMileage",
        "coordinates",
    }
    r = recs["chargingLevelPercent"]
    assert r.measurement_value == "70.0"
    assert r.measurement_data_type == "number"
    assert r.measurement_subject == "WBA0000000000TEST"
    assert r.measurement_publisher == "bmw"
    assert r.timestamp == datetime(2024, 2, 1, 12)
    # correlation id = lastUpdatedAt (reference bmw_to_timescale.py:117)
    assert r.correlation_id == "2024-02-01T12:00:00Z"
    assert recs["isChargerConnected"].measurement_value == "false"
    assert recs["coordinates"].measurement_value == "[51.5, -0.125]"
    assert recs["coordinates"].measurement_data_type == "geography"


def test_bmw_dedup_on_vin_and_timestamp(spark):
    msg2 = json.loads(json.dumps(BASE_STATE))
    msg2["state"]["lastUpdatedAt"] = "2024-02-01T12:10:00Z"
    # 3 messages, one exact-duplicate key → 2 survive → 12 records
    assert _bmw(spark, [BASE_STATE, BASE_STATE, msg2]).count() == 12


def test_bmw_invalid_latitude_skips_coordinates(spark):
    bad = json.loads(json.dumps(BASE_STATE))
    bad["state"]["location"]["coordinates"]["latitude"] = 95.0
    recs = {r.measurement_of for r in _bmw(spark, [bad]).collect()}
    assert "coordinates" not in recs
    assert "range" in recs  # others unaffected


def test_bmw_non_integer_mileage_skipped(spark):
    # reference raises TypeError for non-int mileage (:283); we skip it
    bad = json.loads(json.dumps(BASE_STATE))
    bad["state"]["currentMileage"] = 31546.7
    recs = {r.measurement_of for r in _bmw(spark, [bad]).collect()}
    assert "currentMileage" not in recs


def test_bmw_absent_fields_skipped_not_fatal(spark):
    partial = {
        "vin": "VIN2",
        "state": {
            "lastUpdatedAt": "2024-02-01T13:00:00Z",
            "electricChargingState": {"chargingStatus": "CHARGING"},
        },
    }
    recs = {r.measurement_of for r in _bmw(spark, [partial]).collect()}
    assert recs == {"chargingStatus"}

"""Scalar function + type-inference parity tests (reference
test_timeseries.py / test_helpers.py coverage model)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from eventhub_to_timescale_spark.functions.scalars import (
    parse_bool,
    parse_timestamp_any,
    topic_part,
    wkt_point,
)
from eventhub_to_timescale_spark.functions.typeinfer import infer_type_tag


def _eval(spark, col_fn, values, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r[0] for r in df.select(col_fn(F.col("v"))).collect()]


def test_timestamp_epoch_and_iso(spark):
    out = _eval(
        spark,
        parse_timestamp_any,
        ["1704067200", "1704067200.5", "2024-01-01T00:00:00.000000Z", "2024-01-01 06:30:00"],
    )
    assert out[0] == datetime(2024, 1, 1)
    assert out[1] == datetime(2024, 1, 1, 0, 0, 0, 500000)
    assert out[2] == datetime(2024, 1, 1)
    assert out[3] == datetime(2024, 1, 1, 6, 30)


def test_timestamp_out_of_range_epoch_rejected(spark):
    # reference helpers.py:81-83 rejects epochs outside 0..253402300799
    out = _eval(spark, parse_timestamp_any, ["-5", "253402300800", "nonsense"])
    assert out == [None, None, None]


def test_bool_parse_case_insensitive(spark):
    # reference timescale.py:196-205 (true/false), plus the documented
    # yes/no/on/off extension — unparseable words reject as NULL
    out = _eval(
        spark, parse_bool, ["true", "TRUE", "False", "yes", "no", "maybe", None]
    )
    assert out == [True, True, False, True, False, None, None]


def test_wkt_point_lon_first_and_validation(spark):
    # reference timescale.py:270 emits lon FIRST; :260-263 validates range
    df = spark.createDataFrame([(51.5, -0.1), (95.0, 0.0)], "lat double, lon double")
    out = [
        r[0]
        for r in df.select(wkt_point(F.col("lat"), F.col("lon"))).collect()
    ]
    assert out[0] == "SRID=4326;POINT(-0.1 51.5)"
    assert out[1] is None


def test_topic_parts(spark):
    df = spark.createDataFrame([("homie/kitchen/thermostat/state",)], "t string")
    row = df.select(
        topic_part(F.col("t"), 1),
        topic_part(F.col("t"), -1),
        topic_part(F.col("t"), -2),
    ).collect()[0]
    assert tuple(row) == ("homie", "state", "thermostat")


def test_type_inference_order(spark):
    # bool BEFORE number (reference timeseries.py:116), 2-elem numeric
    # list is geography (:120-124), fallback string
    out = _eval(
        spark,
        infer_type_tag,
        ["true", "False", "42", "-1.5e3", "[51.5, -0.1]", "[1,2,3]", "hello"],
    )
    assert out == [
        "boolean",
        "boolean",
        "number",
        "number",
        "geography",
        "string",
        "string",
    ]

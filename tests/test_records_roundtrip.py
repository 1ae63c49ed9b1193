"""S5 sink ↔ S3 source closure + v1 batch envelope + record validation."""

from __future__ import annotations

import json
from datetime import datetime


def _records_df(spark):
    return spark.createDataFrame(
        [
            (datetime(2024, 2, 1, 12), "s1", "pub", "temp", "21.5", "number", "c1"),
            (datetime(2024, 2, 1, 13), "s2", "pub", "mode", "auto", "string", "c2"),
        ],
        "timestamp timestamp, measurement_subject string, "
        "measurement_publisher string, measurement_of string, "
        "measurement_value string, measurement_data_type string, "
        "correlation_id string",
    )


def test_sink_source_roundtrip(spark):
    from eventhub_to_timescale_spark.ingest.records import parse_record_messages
    from eventhub_to_timescale_spark.sinks.messages import records_to_messages

    wire = records_to_messages(_records_df(spark))
    back = parse_record_messages(wire)
    rows = {r.measurement_of: r for r in back.collect()}
    assert rows["temp"].timestamp == datetime(2024, 2, 1, 12)
    assert rows["temp"].measurement_value == "21.5"
    assert rows["mode"].correlation_id == "c2"
    assert back.count() == 2


def test_v1_batch_envelope_explodes(spark):
    from eventhub_to_timescale_spark.ingest.records import parse_record_batches

    batch = json.dumps(
        [
            {
                "timestamp": "2024-02-01T12:00:00Z",
                "measurement_subject": "s1",
                "measurement_publisher": "p",
                "measurement_of": "a",
                "measurement_value": "1",
                "measurement_data_type": "number",
                "correlation_id": "c",
            },
            {
                "timestamp": "2024-02-01T12:01:00Z",
                "measurement_subject": "s1",
                "measurement_publisher": "p",
                "measurement_of": "b",
                "measurement_value": "x",
                "measurement_data_type": "string",
                "correlation_id": "c",
            },
        ]
    )
    df = spark.createDataFrame([(batch,)], "value string")
    out = parse_record_batches(df)
    assert out.count() == 2
    assert {r.measurement_of for r in out.collect()} == {"a", "b"}


def test_validate_records_split(spark):
    from eventhub_to_timescale_spark.ingest.records import validate_records

    df = spark.createDataFrame(
        [
            (datetime(2024, 2, 1), "s", "p", "ok", "1", "number", "c"),
            # reference KeyErrors on missing correlation_id
            # (timescale.py validate_all_fields_in_record) → reject
            (datetime(2024, 2, 1), "s", "p", "no_cid", "1", "number", None),
            (datetime(2024, 2, 1), None, "p", "no_subject", "1", "number", "c"),
            (datetime(2024, 2, 1), "s", "p", "bad_type", "1", "integer", "c"),
        ],
        "timestamp timestamp, measurement_subject string, "
        "measurement_publisher string, measurement_of string, "
        "measurement_value string, measurement_data_type string, "
        "correlation_id string",
    )
    valid, rejects = validate_records(df)
    assert [r.measurement_of for r in valid.collect()] == ["ok"]
    assert {r.measurement_of for r in rejects.collect()} == {
        "no_cid",
        "no_subject",
        "bad_type",
    }


def test_malformed_messages_keep_raw_for_dead_letter(spark):
    from eventhub_to_timescale_spark.ingest.records import (
        parse_record_batches,
        parse_record_messages,
        validate_records,
    )

    good = json.dumps(
        {
            "timestamp": "2024-02-01T12:00:00Z",
            "measurement_subject": "s",
            "measurement_publisher": "p",
            "measurement_of": "m",
            "measurement_value": "1",
            "measurement_data_type": "number",
            "correlation_id": "c",
        }
    )
    df = spark.createDataFrame([(good,), ("not json",)], "value string")
    _, rejects = validate_records(parse_record_messages(df))
    assert [r.raw for r in rejects.collect()] == ["not json"]

    # v1 batch: malformed batch message must surface, not vanish
    bdf = spark.createDataFrame([(f"[{good}]",), ("garbage",)], "value string")
    parsed = parse_record_batches(bdf)
    assert parsed.count() == 2
    _, brejects = validate_records(parsed)
    assert [r.raw for r in brejects.collect()] == ["garbage"]


def _wire_record(extra=None):
    rec = {
        "timestamp": "2024-02-01T12:00:00.000000Z",
        "measurement_subject": "s1",
        "measurement_publisher": "pub",
        "measurement_of": "temp",
        "measurement_value": "21.5",
        "measurement_data_type": "number",
        "correlation_id": "c1",
    }
    if extra:
        rec.update(extra)
    return json.dumps(rec)


def test_strict_rejects_extra_fields(spark):
    """additionalProperties: false (timeseries.json:78): a message with
    an undeclared key must drop into dead letters under strict mode."""
    from eventhub_to_timescale_spark.ingest.records import (
        parse_record_messages,
        validate_records,
    )

    msgs = [_wire_record(), _wire_record({"smuggled": 1})]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    parsed = parse_record_messages(df)

    valid, rejects = validate_records(parsed, strict=True)
    assert valid.count() == 1
    dead = rejects.collect()
    assert len(dead) == 1
    assert '"smuggled"' in dead[0].raw  # raw preserved for replay

    # default (non-strict) keeps the reference's from_json leniency
    lenient_valid, lenient_rejects = validate_records(parsed)
    assert lenient_valid.count() == 2 and lenient_rejects.count() == 0


def test_strict_exempts_batch_array_envelopes(spark):
    """v1 batch raw text is an ARRAY — json_object_keys is NULL there;
    strict mode must not blanket-reject exploded batch records."""
    from eventhub_to_timescale_spark.ingest.records import (
        parse_record_batches,
        validate_records,
    )

    batch = "[" + _wire_record() + "]"
    df = spark.createDataFrame([(batch,)], "value string")
    valid, rejects = validate_records(parse_record_batches(df), strict=True)
    assert valid.count() == 1 and rejects.count() == 0

"""Error-channel behavior: malformed envelopes, unroutable publishers,
and the JDBC idempotent-merge statement."""

from __future__ import annotations

from tests.conftest import make_envelope


def test_malformed_envelopes_flagged_not_fatal(spark):
    from eventhub_to_timescale_spark.ingest.envelope import (
        envelope_errors,
        envelope_ok,
        parse_envelope,
    )

    raws = [
        "not json at all",
        '{"unexpected": "shape"}',
        "",
        make_envelope("emon/emonTx4", {"time": 1706777400, "P1": 1}),
    ]
    env = parse_envelope(
        spark.createDataFrame([(r,) for r in raws], "value string")
    )
    # reference logs-and-drops (json_converter.py:66-69); we keep both
    # channels: 1 good row, 3 on the dead-letter side
    assert envelope_ok(env).count() == 1
    bad = [r.raw for r in envelope_errors(env).collect()]
    assert len(bad) == 3 and "not json at all" in bad


def test_corrupt_rows_never_reach_converters(spark):
    from eventhub_to_timescale_spark.ingest.envelope import parse_envelope
    from eventhub_to_timescale_spark.ingest.router import route_to_records

    raws = [
        "garbage{{{",
        make_envelope("emon/emonTx4", {"time": 1706777400, "P1": 1}),
        make_envelope("glow/X/SENSOR/electricitymeter", {"electricitymeter": {}}),
    ]
    env = parse_envelope(spark.createDataFrame([(r,) for r in raws], "value string"))
    recs = route_to_records(env).collect()
    # emon yields its record; the empty glow payload yields none
    # (missing timestamp → dropped, reference glow.py:30-31); garbage
    # never produces a record nor an exception
    assert len(recs) == 1 and recs[0].measurement_publisher == "emon"


def test_upsert_sql_shape():
    from eventhub_to_timescale_spark.sinks.conditions import upsert_sql

    sql = upsert_sql("conditions", "conditions_staging_7", ("a", "timestamp"))
    # explicit quoted column list: the target's column order/count may
    # differ from the staged batch (defaulted measurement_unique_id),
    # so SELECT s.* would mis-align values
    assert sql == (
        'INSERT INTO conditions ("a", "timestamp") '
        'SELECT s."a", s."timestamp" FROM conditions_staging_7 s '
        'ON CONFLICT ("timestamp", "measurement_subject", '
        '"measurement_of", "correlation_id") DO NOTHING'
    )
    ansi = upsert_sql("t", "t_s", ("a",), key_cols=("a",), dialect="ansi")
    assert ansi == (
        'INSERT INTO t ("a") SELECT s."a" FROM t_s s '
        'WHERE NOT EXISTS (SELECT 1 FROM t t WHERE t."a" = s."a")'
    )


def test_half_formed_envelopes_reach_dead_letters(spark):
    """Valid JSON missing topic OR payload previously vanished from
    EVERY channel (corrupt required both null; unrouted's NULL
    publisher predicate dropped the row too)."""
    import json

    from eventhub_to_timescale_spark.ingest.envelope import (
        envelope_errors,
        parse_envelope,
    )
    from eventhub_to_timescale_spark.ingest.router import (
        route_to_records,
        unrouted,
    )

    raws = [
        json.dumps({"payload": json.dumps({"power": 1}), "qos": 0}),  # no topic
        json.dumps({"topic": "glow/x/SENSOR/electricitymeter", "qos": 0}),  # no payload
        "complete garbage",
        json.dumps({"topic": "acme/dev", "payload": "1", "qos": 0}),  # unknown pub
    ]
    env = parse_envelope(spark.createDataFrame([(r,) for r in raws], "value string"))
    dead = envelope_errors(env).collect()
    assert len(dead) == 3  # both half-formed rows + the garbage
    assert unrouted(env).count() == 1  # the unknown publisher, exactly once
    assert route_to_records(env).count() == 0  # nothing silently converted

"""Differential test: the single-pass router must produce exactly the
rows the round-1 union-of-converters plan produced, across every edge
case each converter handles (reference json_converter.py:145-163 —
dispatch semantics are defined by the per-publisher converters)."""

from __future__ import annotations

import pytest

from tests.conftest import make_envelope
from tests.test_converters_golden import GLOW_ELEC_PAYLOAD, GLOW_GAS_PAYLOAD

MESSAGES = [
    make_envelope("glow/XXXXXX/SENSOR/electricitymeter", GLOW_ELEC_PAYLOAD),
    make_envelope("glow/XXXXXX/SENSOR/gasmeter", GLOW_GAS_PAYLOAD),
    # glow, but subject not in the allowlist → dropped
    make_envelope("glow/XXXXXX/SENSOR/watermeter", GLOW_ELEC_PAYLOAD),
    # glow whose payload lacks the topic's subject key → null meter
    # timestamp → dropped
    make_envelope("glow/XXXXXX/SENSOR/gasmeter", GLOW_ELEC_PAYLOAD),
    make_envelope(
        "homie/room/thermostat/mode", "auto", timestamp="2024-02-01T09:30:00Z"
    ),
    make_envelope(
        "homie/room/thermostat/measure-temperature",
        "19.5",
        timestamp="2024-02-01T09:31:00Z",
    ),
    # homie, measurement not of interest → dropped
    make_envelope(
        "homie/room/thermostat/battery", "77", timestamp="2024-02-01T09:32:00Z"
    ),
    # homie without an envelope timestamp → dropped
    make_envelope("homie/room/thermostat/state", "idle"),
    make_envelope(
        "emon/emonTx4", {"time": 1706777400.25, "vrms": 243.58, "P1": 155}
    ),
    # emon without the required 'time' key → dropped
    make_envelope("emon/emonTx4", {"vrms": 240.0}),
    # emon, wrong subject → dropped
    make_envelope("emon/other", {"time": 1706777400, "vrms": 240.0}),
    # unknown publisher → unrouted channel, no records
    make_envelope("mystery/topic", {"x": 1}),
    # corrupt (non-JSON) message → corrupt channel, no records
    "this is not json",
]

COLUMNS = [
    "timestamp",
    "measurement_subject",
    "measurement_publisher",
    "measurement_of",
    "measurement_value",
    "measurement_data_type",
    "correlation_id",
]


def _sorted_rows(df):
    return sorted(tuple(r[c] for c in COLUMNS) for r in df.collect())


@pytest.fixture()
def env(envelopes):
    return envelopes(MESSAGES)


def test_single_pass_matches_union(env):
    from eventhub_to_timescale_spark.ingest.router import (
        route_to_records,
        route_to_records_union,
    )

    single = _sorted_rows(route_to_records(env))
    union = _sorted_rows(route_to_records_union(env))
    assert single == union
    # sanity: the edge cases above leave 7 glow-elec + 10 glow-gas +
    # 2 homie + 2 emon records
    assert len(single) == 21


def test_single_pass_plan_has_one_scan(env):
    """The point of the restructure: the source must appear exactly
    once in the physical plan (the union plan scans it three times)."""
    from eventhub_to_timescale_spark.ingest.router import (
        route_to_records,
        route_to_records_union,
    )

    def n_scans(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("ExistingRDD") + plan.count("Scan parquet")

    assert n_scans(route_to_records(env)) == 1
    assert n_scans(route_to_records_union(env)) == 3


def test_dynamic_fallback_routes_unknown_publishers(env, envelopes):
    """dynamic_fallback=True: the 'mystery' publisher's depth-1 payload
    {"x": 1} fans out through the dynamic flatten (subject from topic,
    envelope timestamp) instead of dropping — while every known
    publisher's records are byte-identical to the fallback-off plan,
    and the plan still scans the source exactly once."""
    from eventhub_to_timescale_spark.ingest.router import route_to_records

    base = _sorted_rows(route_to_records(env))
    with_dyn = route_to_records(env, dynamic_fallback=True)
    rows = _sorted_rows(with_dyn)

    known = [r for r in rows if r[2] in ("glow", "homie", "emon")]
    assert known == base

    dyn = [r for r in rows if r[2] == "mystery"]
    # make_envelope without timestamp → envelope ts None → dropped;
    # MESSAGES' mystery message has no timestamp, so add one here
    assert dyn == []
    msgs = [
        make_envelope(
            "acme/device9", {"a": {"b": 2.5}, "ok": True},
            timestamp="2024-02-01T10:00:00Z",
        )
    ]
    out = route_to_records(envelopes(msgs), dynamic_fallback=True).collect()
    got = {
        r.measurement_of: (
            r.measurement_value,
            r.measurement_data_type,
            r.measurement_subject,
            r.measurement_publisher,
        )
        for r in out
    }
    assert got == {
        "b": ("2.5", "number", "device9", "acme"),
        "ok": ("true", "boolean", "device9", "acme"),
    }

    plan = with_dyn._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ExistingRDD") + plan.count("Scan parquet") == 1
